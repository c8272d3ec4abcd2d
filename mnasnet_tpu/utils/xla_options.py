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

# The infer set was tuned at bs128 and is NOT free across the batch range:
# LATENCY_XLAOPT_BASE_r04.json / LATENCY_XLAOPT_OPT_r04.json measured bs1
# +40% (0.136→0.081 ms —
# the 64 MiB scoped budget fits the whole single-image live set), bs2 flat,
# but bs4 −10%, bs8 −17%, bs16 −29% (the bs128 tiling mis-sizes mid-batch
# fusions). Round 4 attached the set unconditionally to every eval/predict
# jit, so run_validation/serving at mid batch paid the regression (VERDICT
# r4 weak #4). The routing below ships the set ONLY where it measured
# ≥ bare: bs1 (r04 A/B) and bs128 (r04 sweep + two lotteries). bs 17–127
# had no r4 measurement; the r05 small-batch sweep (tools/latency_xlaopt.py)
# pins the upper crossover and widens these ranges from data.
INFER_OPTIONS_BATCH_RANGES: tuple[tuple[int, int], ...] = (
    (1, 1),        # measured +40% (LATENCY_XLAOPT_*_r04.json)
    (128, 1 << 30),  # measured +7–11% at bs128; larger keeps the
                     # throughput-tuned set (scoped VMEM only ever binds
                     # tighter as the live set grows — and bs>128 serving
                     # should shard to ≤128 per chip anyway, BASELINE.md
                     # "the bs256 cliff")
)


def infer_options_for_batch(batch_size: int) -> dict[str, str] | None:
    """The measured-safe infer option set for a concrete batch size: the
    bs128-tuned ``TPU_STEP_OPTIONS['infer']`` inside the ranges where it
    measured ≥ bare, ``None`` (bare compile) elsewhere. Pure table lookup —
    backend/env resolution lives in :func:`default_compiler_options`."""
    for lo, hi in INFER_OPTIONS_BATCH_RANGES:
        if lo <= batch_size <= hi:
            return dict(TPU_STEP_OPTIONS["infer"])
    return None


_ENV_KEY = "MNASNET_TPU_XLA_OPTIONS"


def default_compiler_options(
    mode: str = "train", batch_size: int | None = None
) -> dict[str, str] | None:
    """Compile options for the production steps on this backend.

    ``mode`` is 'train' (train/grad steps) or 'infer' (eval/predict
    graphs). For infer, pass the concrete ``batch_size`` when known: the
    tuned set is batch-routed (:func:`infer_options_for_batch`) because it
    regresses mid-size batches (bs4–16, −10..−29% — module docstring);
    ``batch_size=None`` keeps the bs128-tuned set (the large-batch
    throughput default). Resolution order: ``MNASNET_TPU_XLA_OPTIONS`` env
    (``none``/``off`` → None, else a JSON dict used verbatim for BOTH
    modes and every batch size) → the tuned per-mode/per-batch options on
    TPU backends → None elsewhere.
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
        if mode == "infer" and batch_size is not None:
            return infer_options_for_batch(batch_size)
        opts = TPU_STEP_OPTIONS[mode]
        return dict(opts) if opts else None
    return None


class BatchRoutedJit:
    """A jit wrapper whose compile options follow the input batch size.

    ``jax.jit(compiler_options=...)`` fixes the options at wrapper creation,
    but the production eval/predict jits are built before any batch is seen
    (Trainer.__init__, make_jit_eval_step, serving load) and then serve
    arbitrary batch sizes — run_validation at the val loader's size, serving
    at whatever the request carries. This wrapper resolves the options per
    call from the batch argument's leading dim and dispatches to one cached
    ``jax.jit`` per distinct option set (so each input shape still compiles
    exactly once, under the options measured safe for it).

    ``options_for`` defaults to the production infer routing; tests inject
    a recording fake.
    """

    def __init__(self, fn, *, batch_arg: int = 0, options_for=None,
                 **jit_kwargs):
        self._fn = fn
        self._batch_arg = batch_arg
        self._options_for = options_for or (
            lambda bs: default_compiler_options("infer", batch_size=bs)
        )
        self._jit_kwargs = jit_kwargs
        self._cache: dict = {}

    def __call__(self, *args):
        bs = int(args[self._batch_arg].shape[0])
        opts = self._options_for(bs)
        key = None if opts is None else tuple(sorted(opts.items()))
        jf = self._cache.get(key)
        if jf is None:
            import jax

            jf = jax.jit(self._fn, compiler_options=opts,
                         **self._jit_kwargs)
            self._cache[key] = jf
        return jf(*args)
