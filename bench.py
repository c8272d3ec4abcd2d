#!/usr/bin/env python
"""North-star benchmark: MNASNet-1.0 @224 images/sec/chip, train + infer
([B:metric]). Prints ONE JSON line.

Timing method: two-point slope over in-jit `lax.fori_loop` chains — the axon
tunnel adds ~25 ms fixed dispatch+sync per jit call, so single-call timing is
overhead-dominated (see tools/bench_dw.py and the memory note). The chain
feedback negates the input each iteration (exact in bf16) so XLA can neither
hoist the model out of the loop nor algebraically collapse it.

``vs_baseline`` is the measured speedup of the optimized path (bf16, fused
epilogues, 'auto' kernel routing) over this framework's own unoptimized
fp32 path on the same chip — the reference's GPU numbers are unrecoverable
(BASELINE.md §provenance), so the self-relative ratio is the honest,
reproducible number the driver can track across rounds.

Run on the real TPU (default env: JAX_PLATFORMS=axon). ~3-5 min (compiles).
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def _backend_reachable(timeout_s: int = 300) -> bool:
    """Bounded subprocess probe (utils/backend_probe.py): during a tunnel
    outage ``jax.devices()`` hangs ~27 min in-process instead of raising
    (verify-skill symptom log), which would wedge the whole bench. The
    probe lets the bench fail fast with an explicit JSON record instead."""
    from mnasnet_tpu.utils.backend_probe import default_backend_device_count

    return default_backend_device_count(timeout_s=timeout_s) is not None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--iters-lo", type=int, default=4)
    p.add_argument("--iters-hi", type=int, default=16)
    p.add_argument("--mode", choices=["train", "infer", "both"], default="both")
    args = p.parse_args()

    if not _backend_reachable():
        # Same metric key as the success record so consumers see one
        # series; value 0 + error field + nonzero exit make it
        # unmistakably a non-measurement.
        print(json.dumps({
            "metric": (f"{args.arch}@{args.image_size} train "
                       "images/sec/chip (bf16)"),
            "value": 0,
            "unit": "images/sec/chip",
            "vs_baseline": 0,
            "error": "accelerator backend unreachable (tunnel outage) — "
                     "no measurement taken; see BASELINE.md for the "
                     "recorded numbers",
        }))
        return 1

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import make_predict_fn, make_train_step
    from mnasnet_tpu.utils.xla_options import default_compiler_options

    n_chips = jax.device_count()
    bs = args.batch_size
    img = args.image_size
    images = jax.random.normal(
        jax.random.PRNGKey(0), (bs, img, img, 3), jnp.bfloat16
    )
    labels = jnp.zeros((bs,), jnp.int32)

    def slope_time(make_chain):
        # Tunnel dispatch noise is ±2-4 ms per call and single slope
        # readings occasionally produce physically impossible numbers
        # (BASELINE.md "measurement lessons") — min-of-3 on each chain.
        f_lo = make_chain(args.iters_lo)
        f_hi = make_chain(args.iters_hi)
        jax.block_until_ready(f_lo())
        jax.block_until_ready(f_hi())
        t_lo = t_hi = None
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f_lo())
            t = time.perf_counter() - t0
            t_lo = t if t_lo is None else min(t_lo, t)
            t0 = time.perf_counter()
            jax.block_until_ready(f_hi())
            t = time.perf_counter() - t0
            t_hi = t if t_hi is None else min(t_hi, t)
        return (t_hi - t_lo) / (args.iters_hi - args.iters_lo)

    def build(dtype, dw_impl, optimized=False):
        # optimized = the production train configuration (train.py defaults):
        # external BN EMA + packed small-leaf optimizer + space-to-depth stem.
        model = create_model(
            args.arch, dtype=dtype, dw_impl=dw_impl,
            bn_ema="external" if optimized else "module",
            stem_s2d=optimized,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), dtype),
            train=False,
        )
        return model, variables

    results = {}

    _probed: dict = {}

    def resolved_options(optimized, mode):
        # The tuned flags are validated against THIS deployment's compiler
        # (tools/probe_compiler_options.py), but a toolchain swap could
        # invalidate a name and unknown names fail compiles loudly. The
        # bench must never lose the round's artifact to that: probe each
        # mode's options on a trivial jit first (once per distinct set —
        # each probe is a remote compile round-trip) and fall back to None.
        if not optimized:
            return None
        if mode in _probed:
            return _probed[mode]
        opts = default_compiler_options(mode)
        if opts and opts not in [v for v in _probed.values() if v]:
            try:
                jax.block_until_ready(
                    jax.jit(lambda a: a + 1, compiler_options=opts)(
                        jnp.zeros((8, 128), jnp.float32)
                    )
                )
            except Exception:
                results["xla_options_fallback"] = 1.0  # rejected -> bare
                opts = None
        _probed[mode] = opts
        return opts

    def bench_infer(model, variables, x, optimized=False):
        predict = make_predict_fn(model)
        opts = resolved_options(optimized, "infer")

        def make_chain(iters):
            @functools.partial(jax.jit, compiler_options=opts)
            def f(x):
                def body(_, carry):
                    x, acc = carry
                    y = predict(variables["params"], variables["batch_stats"], x)
                    return (-x, acc + jnp.sum(y))
                return lax.fori_loop(
                    0, iters, body, (x, jnp.zeros((), jnp.float32))
                )[1]
            return lambda: f(x)

        return slope_time(make_chain)

    def bench_train(model, variables, x, optimized=False):
        tx = create_optimizer("rmsprop", 0.01,
                              fused="small" if optimized else False)
        state0 = TrainState.create(
            variables["params"], variables["batch_stats"], tx,
            jax.random.PRNGKey(0),
        )
        step = make_train_step(model, tx, 0.1)
        opts = resolved_options(optimized, "train")

        def make_chain(iters):
            @functools.partial(jax.jit, compiler_options=opts)
            def f(state, x):
                def body(_, carry):
                    state, x, acc = carry
                    state, metrics = step(state, x, labels)
                    # consume the loss so the grad/update computation can't
                    # be dead-code-eliminated (returning only state.step
                    # lets XLA delete the whole backward pass)
                    return (state, -x, acc + metrics["loss"])
                _, _, acc = lax.fori_loop(
                    0, iters, body, (state, x, jnp.zeros((), jnp.float32))
                )
                return acc
            return lambda: f(state0, x)

        return slope_time(make_chain)

    # optimized: bf16 + auto kernel routing + fused update paths + s2d stem
    # + tuned XLA:TPU compile options (utils/xla_options.py)
    model, variables = build(jnp.bfloat16, "auto", optimized=True)
    results["infer_ips"] = bs / bench_infer(model, variables, images,
                                            optimized=True)
    if args.mode in ("train", "both"):
        results["train_ips"] = bs / bench_train(model, variables, images,
                                                optimized=True)

    # baseline: fp32, plain XLA routing, no bf16
    model_b, variables_b = build(jnp.float32, "xla")
    imgs32 = images.astype(jnp.float32)
    results["infer_ips_fp32_baseline"] = bs / bench_infer(model_b, variables_b, imgs32)
    if args.mode in ("train", "both"):
        results["train_ips_fp32_baseline"] = bs / bench_train(model_b, variables_b, imgs32)

    headline = results.get("train_ips", results["infer_ips"]) / n_chips
    baseline = results.get(
        "train_ips_fp32_baseline", results["infer_ips_fp32_baseline"]
    ) / n_chips

    # Physics-anchored fractions so rounds are comparable on absolute terms
    # (VERDICT r1 weak #6): model FLOPs from the verified MAC grid, v5e specs.
    from mnasnet_tpu.models.mnasnet import count_macs

    # Analytic MACs/image, any (α, size) — verified against the published
    # grid (SURVEY.md §2.1: 314.4M @ α=1.0/224 vs the paper's ~315M).
    MACS = count_macs(model.alpha, img)
    physics = {}
    if MACS:
        V5E_BF16_FLOPS = 197e12
        infer_flops = 2 * MACS * results["infer_ips"] / n_chips
        physics = {
            "infer_mfu_pct_of_spec": round(100 * infer_flops / V5E_BF16_FLOPS, 2),
        }
        if "train_ips" in results:  # only label train MFU when train ran
            train_flops = 6 * MACS * results["train_ips"] / n_chips
            physics["train_mfu_pct_of_spec"] = round(
                100 * train_flops / V5E_BF16_FLOPS, 2
            )
            # measured bf16 matmul ceiling through the axon tunnel is
            # 42-68 TFLOP/s (BASELINE.md) — fraction of its midpoint:
            physics["train_pct_of_measured_matmul_ceiling"] = round(
                100 * train_flops / 55e12, 1
            )

    print(
        json.dumps(
            {
                "metric": f"{args.arch}@{img} train images/sec/chip (bf16)",
                "value": round(headline, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(headline / baseline, 3),
                "detail": {k: round(v, 2) for k, v in results.items()},
                "physics": physics,
                "n_chips": n_chips,
                "batch_size": bs,
            }
        )
    )


if __name__ == "__main__":
    import sys

    sys.exit(main())
