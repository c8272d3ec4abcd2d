"""Serving-side loader for exported StableHLO artifacts.

``tools/export_serving.py`` produces the deploy artifact (eval-mode forward,
weights baked in, optionally symbolic batch). Loading it with bare
``jax.export.deserialize(...).call`` works but forfeits the tuned infer
compile options (+7–11% at bs128, utils/xla_options.py) — the artifact
route had no mechanism to attach them, so a serving fleet ran at the bare
3.0–3.1 ms rate while the live jitted predict ran at 2.7 ms (VERDICT r4
missing #2, EXPORT_LATENCY_r04.json). :func:`load_serving` is that
mechanism: deserialize once, then serve through a batch-routed jit that
compiles each incoming batch size under the option set measured safe for it
(the tuned set regresses bs4–16 by 10–29%, so routing — not unconditional
attachment — is the correct fix; LATENCY_XLAOPT_BASE_r04.json /
LATENCY_XLAOPT_OPT_r04.json and the r05 sweep, tools/latency_xlaopt.py).

Usage::

    from mnasnet_tpu.serving import load_serving
    predict = load_serving("model.shlo")          # path, bytes, or Exported
    logits = predict(images)                      # float32 [b, num_classes]

Measured: tools/export_latency.py — the optioned artifact path vs the
optioned live predict, per batch size.
Exactness vs the live forward: tests/test_export_serving.py.
"""

from __future__ import annotations

import os

from mnasnet_tpu.utils.xla_options import (
    BatchRoutedJit,
    default_compiler_options,
)


def load_serving(artifact, *, compiler_options="auto"):
    """Deserialize a serving artifact and return a compiled predict callable.

    ``artifact`` is a path to the ``.shlo`` file, the serialized ``bytes``,
    or an already-deserialized ``jax.export.Exported``. ``compiler_options``:

      * ``"auto"`` (default) — batch-routed tuned options: each distinct
        incoming batch size compiles once, under
        ``default_compiler_options("infer", batch_size=bs)`` (the
        measured-safe set for that size; ``None``/bare where the tuned set
        measured below bare). This is what a fleet should run.
      * a dict — attached verbatim to every compile (expert override).
      * ``None`` — bare compiles (the old behavior, for A/B baselines).

    The returned callable accepts the artifact's call contract (images →
    logits; uint8 for ``--raw-input`` exports, float32 otherwise). With a
    symbolic-batch artifact every batch size works and each compiles on
    first use — same trade-off as the live jit.
    """
    import jax

    if isinstance(artifact, (str, os.PathLike)):
        with open(artifact, "rb") as f:
            artifact = f.read()
    if isinstance(artifact, (bytes, bytearray)):
        artifact = jax.export.deserialize(bytes(artifact))

    call = artifact.call
    if compiler_options == "auto":
        return BatchRoutedJit(call, batch_arg=0)
    return jax.jit(call, compiler_options=compiler_options)
