#!/usr/bin/env python
"""North-star benchmark: MNASNet-1.0 @224 images/sec/chip, train + infer
([B:metric]). Prints ONE JSON line.

``vs_baseline`` is measured speedup of the optimized path (bf16 + fused
kernels) over this framework's own unoptimized XLA-fp32 path on the same
chip — the reference's own GPU numbers are unrecoverable (BASELINE.md), so
the self-relative ratio is the honest, reproducible comparison the driver can
track across rounds.

Run on the real TPU (default env: JAX_PLATFORMS=axon). ~1 min.
"""

from __future__ import annotations

import argparse
import json
import time


def _bench_fn(fn, args, *, warmup=3, iters=10):
    import jax

    # compile + warmup
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--mode", choices=["train", "infer", "both"], default="both")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mnasnet_tpu import create_model
    from mnasnet_tpu.parallel.mesh import make_mesh
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.steps import make_predict_fn, make_train_step
    from mnasnet_tpu.train.state import TrainState

    n_chips = jax.device_count()
    bs = args.batch_size
    img = args.image_size
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (bs, img, img, 3), jnp.bfloat16)
    labels = jnp.zeros((bs,), jnp.int32)

    results = {}

    def build(dtype, dw_impl, precision=None):
        model = create_model(args.arch, dtype=dtype, dw_impl=dw_impl,
                             precision=precision)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), dtype),
            train=False,
        )
        return model, variables

    # ---- optimized inference (bf16 + fused dw) ----
    model, variables = build(jnp.bfloat16, "auto")
    predict = jax.jit(make_predict_fn(model))
    dt = _bench_fn(
        predict,
        (variables["params"], variables["batch_stats"], images),
        iters=args.iters,
    )
    results["infer_ips"] = bs / dt

    # ---- baseline inference (fp32, plain XLA, no fusion flags) ----
    model_b, variables_b = build(jnp.float32, "xla")
    predict_b = jax.jit(make_predict_fn(model_b))
    dt_b = _bench_fn(
        predict_b,
        (variables_b["params"], variables_b["batch_stats"],
         images.astype(jnp.float32)),
        iters=max(args.iters // 2, 3),
    )
    results["infer_ips_baseline"] = bs / dt_b

    if args.mode in ("train", "both"):
        tx = create_optimizer("rmsprop", 0.01)

        def make_state(variables):
            return TrainState.create(
                variables["params"], variables["batch_stats"], tx,
                jax.random.PRNGKey(0),
            )

        # optimized train step (bf16 compute)
        step = jax.jit(make_train_step(model, tx, 0.1), donate_argnums=(0,))
        state = make_state(variables)

        def run(state):
            state, m = step(state, images, labels)
            return state, m

        state, m = run(state)  # compile
        jax.block_until_ready(m)
        for _ in range(3):
            state, m = run(state)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = run(state)
        jax.block_until_ready(m)
        dt_t = (time.perf_counter() - t0) / args.iters
        results["train_ips"] = bs / dt_t

        # baseline train step (fp32, xla dw)
        step_b = jax.jit(make_train_step(model_b, tx, 0.1), donate_argnums=(0,))
        state_b = make_state(variables_b)
        imgs32 = images.astype(jnp.float32)
        state_b, m_b = step_b(state_b, imgs32, labels)
        jax.block_until_ready(m_b)
        t0 = time.perf_counter()
        for _ in range(max(args.iters // 2, 3)):
            state_b, m_b = step_b(state_b, imgs32, labels)
        jax.block_until_ready(m_b)
        dt_tb = (time.perf_counter() - t0) / max(args.iters // 2, 3)
        results["train_ips_baseline"] = bs / dt_tb

    headline = results.get("train_ips", results["infer_ips"]) / n_chips
    baseline = results.get("train_ips_baseline", results["infer_ips_baseline"]) / n_chips
    print(
        json.dumps(
            {
                "metric": f"{args.arch}@{img} train images/sec/chip (bf16, fused)",
                "value": round(headline, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(headline / baseline, 3),
                "detail": {k: round(v, 2) for k, v in results.items()},
                "n_chips": n_chips,
                "batch_size": bs,
            }
        )
    )


if __name__ == "__main__":
    main()
