#!/usr/bin/env python
"""Interleaved A/B of the infer step's 1×1-conv lowering (conv vs dot),
optionally crossed with compile-option sets and batch sizes.

Why a dedicated tool: tools/sweep_compiler_options.py interleaves across
COMPILER options on one fixed graph; this races two different GRAPHS
(`pw_lowering='conv'` vs `'dot'`, mnasnet.py MBConv pointwise convs) under
the same drift-robust protocol — compile every chain first, then time all
configs round-robin and slope the per-chain minima. The sequential A/B in
the round-4 queue (conv 2.632 ms → dot 2.558 ms, +2.9% at bs128 with the
shipped infer options) motivated this confirmation; sequential protocols
confound config effects with tunnel drift (BASELINE.md "the estimator
artifact").

Emits rows {batch, lowering, options_label, ms_per_step, img_s}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batches", default="128")
    p.add_argument("--iters-lo", type=int, default=4)
    p.add_argument("--iters-hi", type=int, default=16)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--with-options", default="shipped",
                   choices=["shipped", "none", "both"],
                   help="attach the shipped infer compile options, none, "
                        "or race both")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.steps import make_predict_fn
    from mnasnet_tpu.utils.xla_options import TPU_STEP_OPTIONS

    img = args.image_size
    batches = [int(b) for b in args.batches.split(",")]
    opt_sets = {"shipped": dict(TPU_STEP_OPTIONS["infer"]), "none": None}
    if args.with_options != "both":
        opt_sets = {args.with_options: opt_sets[args.with_options]}

    # Build every (batch, lowering, options) chain pair up front.
    chains = []  # (key, f_lo, f_hi)
    for lowering in ("conv", "dot"):
        model = create_model(args.arch, dtype=jnp.bfloat16,
                             bn_ema="external", stem_s2d=True,
                             pw_lowering=lowering)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, img, img, 3), jnp.bfloat16),
                       train=False)
        predict = make_predict_fn(model)
        for bs in batches:
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (bs, img, img, 3), jnp.bfloat16)
            for opts_label, opts in opt_sets.items():
                def make_chain(iters, predict=predict, v=v, x=x, opts=opts):
                    def f(x):
                        def body(_, carry):
                            x, acc = carry
                            y = predict(v["params"], v["batch_stats"], x)
                            return (-x, acc + jnp.sum(y))
                        return lax.fori_loop(
                            0, iters, body, (x, jnp.zeros((), jnp.float32))
                        )[1]
                    jf = jax.jit(f, compiler_options=opts)
                    return lambda: jf(x)
                key = (bs, lowering, opts_label)
                f_lo = make_chain(args.iters_lo)
                f_hi = make_chain(args.iters_hi)
                jax.block_until_ready(f_lo())  # compile now
                jax.block_until_ready(f_hi())
                chains.append((key, f_lo, f_hi))
                print(f"compiled bs={bs} {lowering} opts={opts_label}",
                      flush=True)

    # Round-robin timing; track per-chain minima (noise-floor-robust
    # estimator — slope of minima, NOT min of per-round slopes).
    best_lo = {key: None for key, *_ in chains}
    best_hi = {key: None for key, *_ in chains}
    for r in range(args.repeats):
        for key, f_lo, f_hi in chains:
            t0 = time.perf_counter()
            jax.block_until_ready(f_lo())
            t = time.perf_counter() - t0
            if best_lo[key] is None or t < best_lo[key]:
                best_lo[key] = t
            t0 = time.perf_counter()
            jax.block_until_ready(f_hi())
            t = time.perf_counter() - t0
            if best_hi[key] is None or t < best_hi[key]:
                best_hi[key] = t
        print(f"round {r + 1}/{args.repeats} done", flush=True)

    rows = []
    for key, *_ in chains:
        bs, lowering, opts_label = key
        s = (best_hi[key] - best_lo[key]) / (args.iters_hi - args.iters_lo)
        rows.append({"batch": bs, "lowering": lowering,
                     "options": opts_label,
                     "ms_per_step": round(s * 1e3, 4),
                     "img_s": round(bs / s)})
        print(f"bs={bs:4} {lowering:5} opts={opts_label:8} "
              f"{s*1e3:7.3f} ms/step {bs/s:9,.0f} img/s", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "arch": args.arch, "image_size": img,
                "method": ("interleaved round-robin over all configs, "
                           f"slope of per-chain minima, {args.repeats} "
                           "rounds (drift-robust)"),
                "rows": rows,
            }, f, indent=1)
            f.write("\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
