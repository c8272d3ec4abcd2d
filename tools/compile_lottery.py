#!/usr/bin/env python
"""Measure compile-time nondeterminism: N fresh compiles of ONE step.

Round-4 sweeps produced contradictory per-flag results across sessions:
the identical infer step (mnasnet1_0 @224 bs128 bf16) measured 1.61 ms in
one session under ``xla_tpu_scoped_vmem_limit_kib=65536``, 2.55 ms in the
next session under the same flag — while in that second session the same
1.66 ms time appeared under v64+vmem_to_vmem_dmas instead, interleaved in
the SAME timing rounds as slow binaries. Drift cannot explain a per-
executable 60% split inside one round-robin; compile nondeterminism can.

This tool compiles the SAME chain function N times (fresh Python closures
→ fresh pjit cache entries → fresh PJRT compile requests), slope-times
each resulting executable, and reports the distribution. If it is bimodal
(~1.65 vs ~2.6 ms), the right production move is best-of-N compilation
(AOT-compile k times, keep the fastest executable), not flag hunting.

Usage: python tools/compile_lottery.py --mode infer --n 8 \
           [--options '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'] \
           [--out COMPILE_LOTTERY_INFER_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--mode", choices=["train", "infer"], default="infer")
    p.add_argument("--n", type=int, default=8, help="independent compiles")
    p.add_argument("--iters-lo", type=int, default=4)
    p.add_argument("--iters-hi", type=int, default=16)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--options", default=None,
                   help="JSON dict of compiler_options (default: none)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    options = json.loads(args.options) if args.options else None

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import make_predict_fn, make_train_step

    bs = args.batch_size
    images = jax.random.normal(
        jax.random.PRNGKey(0), (bs, args.image_size, args.image_size, 3),
        jnp.bfloat16,
    )
    labels = jnp.zeros((bs,), jnp.int32)
    model = create_model(
        args.arch, dtype=jnp.bfloat16, bn_ema="external", stem_s2d=True
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.image_size, args.image_size, 3), jnp.bfloat16),
        train=False,
    )
    tx = create_optimizer("rmsprop", 0.01, fused="small")
    state0 = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(0)
    )
    step = make_train_step(model, tx, 0.1)
    predict = make_predict_fn(model)

    def chain(iters):
        # A fresh function object per call — defeats the pjit cache so each
        # jit triggers a fresh PJRT compile request.
        if args.mode == "infer":
            def f(x):
                def body(_, carry):
                    x, acc = carry
                    y = predict(
                        variables["params"], variables["batch_stats"], x
                    )
                    return (-x, acc + jnp.sum(y))
                return lax.fori_loop(
                    0, iters, body, (x, jnp.zeros((), jnp.float32))
                )[1]
            jf = jax.jit(f, compiler_options=options)
            return lambda: jf(images)

        def f(state, x):
            def body(_, carry):
                state, x, acc = carry
                state, metrics = step(state, x, labels)
                return (state, -x, acc + metrics["loss"])
            _, _, acc = lax.fori_loop(
                0, iters, body, (state, x, jnp.zeros((), jnp.float32))
            )
            return acc
        jf = jax.jit(f, compiler_options=options)
        return lambda: jf(state0, images)

    # Compile all executables first (each compile is independent), then
    # slope-time them interleaved so machine drift hits all equally.
    execs = []
    for i in range(args.n):
        t0 = time.time()
        f_lo, f_hi = chain(args.iters_lo), chain(args.iters_hi)
        jax.block_until_ready(f_lo())
        jax.block_until_ready(f_hi())
        print(f"compiled #{i} in {time.time()-t0:.0f}s", flush=True)
        execs.append((f_lo, f_hi))

    best_lo = [None] * args.n
    best_hi = [None] * args.n
    for r in range(args.repeats):
        for i, (f_lo, f_hi) in enumerate(execs):
            t0 = time.perf_counter()
            jax.block_until_ready(f_lo())
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f_hi())
            t_hi = time.perf_counter() - t0
            best_lo[i] = t_lo if best_lo[i] is None else min(best_lo[i], t_lo)
            best_hi[i] = t_hi if best_hi[i] is None else min(best_hi[i], t_hi)
        print(f"round {r+1}/{args.repeats} done", flush=True)

    times = []
    for i in range(args.n):
        s = (best_hi[i] - best_lo[i]) / (args.iters_hi - args.iters_lo)
        times.append(s * 1e3)
        print(f"executable #{i}: {s*1e3:7.3f} ms/step  {bs/s:9,.0f} img/s",
              flush=True)

    result = {
        "arch": args.arch, "image_size": args.image_size, "batch_size": bs,
        "mode": args.mode, "options": options, "n_compiles": args.n,
        "method": "slope of per-executable minima, interleaved rounds",
        "ms_per_step": times,
        "spread_pct": round(
            100 * (max(times) - min(times)) / min(times), 1),
    }
    print(json.dumps({k: result[k] for k in ("ms_per_step", "spread_pct")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
