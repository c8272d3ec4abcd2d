#!/usr/bin/env python
"""Depth-multiplier × resolution sweep — the NAS-style eval grid of
[B:configs[4]] (α 0.35–1.3, 96–224 px).

For each grid point: parameter count, MACs, and measured inference
images/sec/chip (bf16, slope-timed). With ``--train`` also times the train
step. Output: one JSON line per point + a summary table.

    python tools/sweep_grid.py [--alphas 0.35,0.5,1.0] [--sizes 96,160,224]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def count_macs(alpha: float, image_size: int) -> int:
    """Re-export: the analytic counter lives in the package proper
    (models/mnasnet.py) so bench.py can compute physics for any (α, size)."""
    from mnasnet_tpu.models.mnasnet import count_macs as _cm

    return _cm(alpha, image_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alphas", default="0.35,0.5,0.75,1.0,1.3,1.4")
    p.add_argument("--sizes", default="96,160,224")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--train", action="store_true")
    p.add_argument("--iters-lo", type=int, default=4)
    p.add_argument("--iters-hi", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from mnasnet_tpu import MNASNet

    alphas = [float(a) for a in args.alphas.split(",")]
    sizes = [int(s) for s in args.sizes.split(",")]
    bs = args.batch_size

    def slope_time(make_chain):
        f_lo, f_hi = make_chain(args.iters_lo), make_chain(args.iters_hi)
        jax.block_until_ready(f_lo())
        jax.block_until_ready(f_hi())
        t0 = time.perf_counter()
        jax.block_until_ready(f_lo())
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(f_hi())
        t_hi = time.perf_counter() - t0
        return (t_hi - t_lo) / (args.iters_hi - args.iters_lo)

    rows = []
    for alpha in alphas:
        for size in sizes:
            model = MNASNet(alpha=alpha, dtype=jnp.bfloat16)
            x = jax.random.normal(
                jax.random.PRNGKey(0), (bs, size, size, 3), jnp.bfloat16
            )
            variables = model.init(
                jax.random.PRNGKey(0), x[:1], train=False
            )
            n_params = sum(
                int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
            )

            def make_chain(iters):
                @jax.jit
                def f(x):
                    def body(_, carry):
                        x, acc = carry
                        y = model.apply(variables, x, train=False)
                        return (-x, acc + jnp.sum(y))
                    return lax.fori_loop(
                        0, iters, body, (x, jnp.zeros((), jnp.float32))
                    )[1]
                return lambda: f(x)

            dt = slope_time(make_chain)
            row = {
                "alpha": alpha,
                "image_size": size,
                "params": n_params,
                "macs": count_macs(alpha, size),
                "infer_ips": round(bs / dt, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(f"\n{'alpha':>6} {'size':>5} {'params':>10} {'MMACs':>8} {'img/s':>10}")
    for r in rows:
        print(f"{r['alpha']:>6} {r['image_size']:>5} {r['params']:>10,} "
              f"{r['macs']/1e6:>8.1f} {r['infer_ips']:>10,.0f}")


if __name__ == "__main__":
    main()
