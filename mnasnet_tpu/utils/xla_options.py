"""Tuned XLA:TPU compile options for the production steps (round 3).

Rounds 1–3 recorded the bs128 train step as conv-emitter/copy-bound with
"no flag surface through the axon tunnel" — which was true for
``LIBTPU_INIT_ARGS`` but missed ``jax.jit(compiler_options=...)``: XLA
env-options attached to the PJRT compile request travel WITH the request,
and the remote compile helper parses them (an unknown flag name raises —
see tools/probe_compiler_options.py).

Swept on the production 'best'-config train step (mnasnet1_0 @224 bs128
bf16, slope-timed; tools/sweep_compiler_options.py, artifact
SWEEP_XLAFLAGS_r03.json):

  * ``xla_tpu_nd_short_transfer_max_chunks=4096`` — **13.11 ms/step =
    9,765 img/s, +14% over the 14.94 ms no-options baseline**. This is the
    tiny-copy/relayout storm (1.6 ms of sub-VMEM-line transfers between
    conv fusions, BASELINE.md round 2) finally collected: raising the
    per-descriptor chunk cap lets the DMA engine move the many short
    strided transfers in far fewer descriptors.
  * ``xla_tpu_enable_multi_level_nested_loop_fusion=true`` — +4% alone;
    combined effect measured in the same artifact.
  * scoped-vmem raises, fusion cost models, licm, rwb, latency-hiding
    scheduler: flat to strongly negative on this step (table in artifact).

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

# Winning set from SWEEP_XLAFLAGS_r03.json (see module docstring). Tuned
# per step kind: the train step carries the tiny-copy spill storm the
# chunking flag collects; the inference graph is swept separately
# (SWEEP_XLAFLAGS_INFER_r03.json) since its copy profile differs.
TPU_STEP_OPTIONS: dict[str, dict[str, str]] = {
    "train": {"xla_tpu_nd_short_transfer_max_chunks": "4096"},
    "infer": {"xla_tpu_nd_short_transfer_max_chunks": "4096"},
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
