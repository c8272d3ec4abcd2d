#!/usr/bin/env python
"""Small-batch inference latency sweep: XLA routing vs fused Pallas MBConv
([B:north_star] fused-kernel clause; VERDICT r2 missing #3).

All round-1/2 measurements justifying 'auto'→XLA were at batch ≥64, where
inference is MXU-bound on the pointwise convs. The fused MBConv's 4–6× HBM
saving should matter most at batch 1–16 — the serving-latency regime the
MnasNet paper's Pixel-1 metric is about. This tool measures it: per-forward
latency for bs ∈ {1,2,4,8,16,32,64,128} × impl ∈ {auto(=XLA), pallas}.

Timing: two-point slope over in-jit fori_loop chains (min-of-3), per the
measured tunnel pitfalls (BASELINE.md "microbenchmark lessons") — the ~25 ms
fixed dispatch makes single-call timing garbage, and small-batch forwards are
sub-ms, so chains are long (32/128 iterations).

Emits LATENCY_r03.json with the full table; run on the real TPU.
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
    p.add_argument("--batches", default="1,2,4,8,16,32,64,128")
    p.add_argument("--iters-lo", type=int, default=32)
    p.add_argument("--iters-hi", type=int, default=128)
    p.add_argument("--out", default=os.path.join(REPO, "LATENCY_r03.json"))
    p.add_argument("--impls", default="auto,pallas",
                   help="comma-separated dw_impl values to race")
    p.add_argument("--xla-options", default=None,
                   help="JSON dict of compiler_options to attach to every "
                        "jit (A/B the tuned flags in the latency regime)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.steps import make_predict_fn

    batches = [int(b) for b in args.batches.split(",")]
    img = args.image_size
    xla_options = json.loads(args.xla_options) if args.xla_options else None

    def slope_time(make_chain, lo, hi):
        f_lo = make_chain(lo)
        f_hi = make_chain(hi)
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
        return (t_hi - t_lo) / (hi - lo)

    def bench(dw_impl: str, bs: int) -> float:
        model = create_model(args.arch, dtype=jnp.bfloat16, dw_impl=dw_impl)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.bfloat16),
            train=False,
        )
        predict = make_predict_fn(model)
        x0 = jax.random.normal(
            jax.random.PRNGKey(1), (bs, img, img, 3), jnp.bfloat16
        )

        def make_chain(iters):
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
            jf = jax.jit(f, compiler_options=xla_options)
            return lambda: jf(x0)

        return slope_time(make_chain, args.iters_lo, args.iters_hi)

    table = []
    for bs in batches:
        row = {"batch": bs}
        for impl in args.impls.split(","):
            try:
                t = bench(impl, bs)
            except Exception as e:  # record, keep sweeping
                row[f"{impl}_error"] = str(e)[:300]
                continue
            row[f"{impl}_ms"] = round(t * 1e3, 4)
            row[f"{impl}_ips"] = round(bs / t, 1)
        if "auto_ms" in row and "pallas_ms" in row:
            row["pallas_speedup"] = round(row["auto_ms"] / row["pallas_ms"], 3)
        table.append(row)
        print(json.dumps(row), flush=True)

    wins = [r["batch"] for r in table if r.get("pallas_speedup", 0) > 1.02]
    out = {
        "arch": args.arch,
        "image_size": img,
        "dtype": "bfloat16",
        "method": "two-point slope over in-jit fori_loop chains, min-of-3",
        "iters": [args.iters_lo, args.iters_hi],
        "table": table,
        "pallas_wins_at_batches": wins,
        "conclusion": (
            f"fused Pallas MBConv wins at bs {wins}" if wins else
            "complete measured negative: XLA routing faster at every batch"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"pallas_wins_at_batches": wins}))


if __name__ == "__main__":
    main()
