"""Tuned XLA:TPU compile options for the production steps (round 4).

Rounds 1–3 recorded the bs128 train step as conv-emitter/copy-bound with
"no flag surface through the axon tunnel" — which was true for
``LIBTPU_INIT_ARGS`` but missed ``jax.jit(compiler_options=...)``: XLA
env-options attached to the PJRT compile request travel WITH the request,
and the remote compile helper parses them (an unknown flag name raises —
see tools/probe_compiler_options.py).

**Round-4 correction.** Round 3 shipped
``xla_tpu_nd_short_transfer_max_chunks=4096`` claiming "+14% train"
(13.11 ms/step), and an early r4 sweep showed scoped-vmem 64 MiB at
"+65% infer" (1.61 ms). Both were **estimator artifacts**: the sweep's
interleaved protocol took the min over rounds of PER-ROUND slopes, which
latches any round whose low-count timing was inflated by tunnel dispatch
noise (a NEGATIVE per-step time in SWEEP_XLAFLAGS_INFER2_r04.json was the
smoking gun). Re-measured with the noise-floor-robust estimator (slope of
per-chain minima — the same one bench.py always used, which is why the
driver bench stayed flat at ~8.4k img/s across rounds) and cross-checked
with fresh-compile lotteries (tools/compile_lottery.py, 8 compiles per
config, no 1.6 ms binary exists):

  * train (SWEEP_XLAFLAGS_TRAIN2_r04.json, mnasnet1_0 @224 bs128 bf16):
    baseline 15.18 ms/step; best = ``xla_tpu_enable_vmem_to_vmem_dmas``
    at 15.08 ms (**+0.7%**, reproduced ≥ baseline in two sessions);
    ``..._nd_short_transfer_max_chunks=4096`` +0.4%; scoped-vmem 64 MiB
    −13% (hurts train); everything else flat-to-negative. The honest
    conclusion: the train step has no large compile-option win on this
    toolchain — the r3 "+14%" never existed.
  * infer (SWEEP_XLAFLAGS_INFER3_r04.json + COMPILE_LOTTERY_INFER_r04 /
    _V64_r04.json, bs128 bf16): ``xla_tpu_scoped_vmem_limit_kib=65536`` +
    ``xla_tpu_enable_vmem_to_vmem_dmas`` = 2.70 ms vs 3.01 ms baseline
    (**+7–11%** — robust sweep +11.6%; the two 8-compile lotteries'
    medians, 2.68 vs 2.87 ms, give +7% with barely-overlapping
    distributions). The larger scoped-VMEM budget lets the fwd-only graph
    keep whole activation planes VMEM-resident (it *hurts* train, whose
    live set then spills); vmem-to-vmem DMAs skip HBM round-trips between
    fusions.

The defaults below apply only on TPU backends ('tpu', 'axon'); CPU runs
(tests, virtual meshes) get ``None`` — these are TPU-compiler env options
and the CPU client would reject them. Override / disable via the
``MNASNET_TPU_XLA_OPTIONS`` env var: ``none`` disables, otherwise a JSON
dict replaces the defaults wholesale (the escape hatch for future
toolchains where a flag name disappears — unknown names fail compiles
loudly by design).
"""

from __future__ import annotations

import json
import os

# Measured-best sets from the round-4 drift-robust sweeps (module
# docstring). Train: vmem-to-vmem DMAs, the only option ≥ baseline in
# both sessions (+0.7% — small but real). Infer: 64 MiB scoped VMEM +
# vmem-to-vmem DMAs (+7–11%, lottery-confirmed across fresh compiles).
TPU_STEP_OPTIONS: dict[str, dict[str, str]] = {
    "train": {"xla_tpu_enable_vmem_to_vmem_dmas": "true"},
    "infer": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_enable_vmem_to_vmem_dmas": "true",
    },
}

_ENV_KEY = "MNASNET_TPU_XLA_OPTIONS"


def default_compiler_options(mode: str = "train") -> dict[str, str] | None:
    """Compile options for the production steps on this backend.

    ``mode`` is 'train' (train/grad steps) or 'infer' (eval/predict
    graphs). Resolution order: ``MNASNET_TPU_XLA_OPTIONS`` env
    (``none``/``off`` → None, else a JSON dict used verbatim for BOTH
    modes) → the tuned per-mode ``TPU_STEP_OPTIONS`` on TPU backends →
    None elsewhere.
    """
    if mode not in TPU_STEP_OPTIONS:
        raise ValueError(f"mode must be one of {sorted(TPU_STEP_OPTIONS)}")
    raw = os.environ.get(_ENV_KEY)
    if raw is not None:
        s = raw.strip()
        if s.lower() in ("", "none", "off", "0"):
            return None
        return json.loads(s)
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        opts = TPU_STEP_OPTIONS[mode]
        return dict(opts) if opts else None
    return None
