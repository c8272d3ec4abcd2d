#!/usr/bin/env python
"""Serving-export latency record (VERDICT r3 item 8, [B:configs[0..1]]).

The StableHLO serving artifact (tools/export_serving.py) has exact-match
correctness tests but no measured numbers. This tool times the exported
artifact against the live jitted predict at bs ∈ {1, 8, 128} on the current
backend, confirming the export path costs nothing at serving time: both
routes lower to the same XLA program, so per-forward device time should be
equal within tunnel noise (the artifact's one-time deserialize+compile is
reported separately — that is the cold-start cost a serving fleet pays once
per process).

Timing: two-point slope over in-jit fori_loop chains, min-of-N — single-call
timing is dispatch-dominated through the axon tunnel (BASELINE.md
"microbenchmark lessons"). The artifact's call is traced INTO the chain jit,
so the comparison is device-time against device-time.

Emits EXPORT_LATENCY_r04.json. Run: python tools/export_latency.py  (TPU;
add JAX_PLATFORMS=cpu for the CPU column).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.export_serving import build_forward, export_artifact  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="mnasnet1_0")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batches", default="1,8,128")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "EXPORT_LATENCY_r04.json"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    backend = jax.default_backend()
    img = args.image_size
    batches = [int(b) for b in args.batches.split(",")]

    def slope_time(make_chain, lo, hi):
        f_lo, f_hi = make_chain(lo), make_chain(hi)
        jax.block_until_ready(f_lo())
        jax.block_until_ready(f_hi())
        t_lo = t_hi = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(f_lo())
            t = time.perf_counter() - t0
            t_lo = t if t_lo is None else min(t_lo, t)
            t0 = time.perf_counter()
            jax.block_until_ready(f_hi())
            t = time.perf_counter() - t0
            t_hi = t if t_hi is None else min(t_hi, t)
        return (t_hi - t_lo) / (hi - lo)

    # One symbolic-batch artifact serves every bs — the production shape
    # ([B:configs[0]] single-image .. [B:configs[1]] batched serving).
    fn, x0 = build_forward(args.arch, 1000, "bfloat16", None, img, 8)
    t0 = time.time()
    blob = export_artifact(fn, x0, [backend if backend != "axon" else "tpu"],
                           symbolic_batch=True)
    export_s = time.time() - t0
    t0 = time.time()
    exported = jax.export.deserialize(blob)
    deser_s = time.time() - t0

    rows = []
    for bs in batches:
        x = jax.random.normal(jax.random.PRNGKey(0), (bs, img, img, 3),
                              jnp.float32)
        # chain lengths scale down with batch so each timing call stays
        # ~O(100ms) device time
        lo, hi = (32, 128) if bs <= 8 else (4, 16)

        def chain_of(call):
            def make_chain(iters):
                @jax.jit
                def f(x):
                    def body(_, carry):
                        x, acc = carry
                        y = call(x)
                        return (-x, acc + jnp.sum(y))
                    return lax.fori_loop(
                        0, iters, body, (x, jnp.zeros((), jnp.float32))
                    )[1]
                return lambda: f(x)
            return make_chain

        t_live = slope_time(chain_of(fn), lo, hi)
        t_art = slope_time(chain_of(exported.call), lo, hi)
        rows.append({
            "batch": bs,
            "live_ms": round(t_live * 1e3, 4),
            "artifact_ms": round(t_art * 1e3, 4),
            "artifact_overhead_pct": round(100 * (t_art / t_live - 1), 2),
            "live_img_s": round(bs / t_live),
            "artifact_img_s": round(bs / t_art),
        })
        print(f"bs={bs:4d}  live {t_live*1e3:8.3f} ms  "
              f"artifact {t_art*1e3:8.3f} ms  "
              f"({rows[-1]['artifact_overhead_pct']:+.1f}%)", flush=True)

    out = {
        "arch": args.arch,
        "image_size": img,
        "backend": backend,
        "artifact": {
            "bytes": len(blob),
            "symbolic_batch": True,
            "export_seconds": round(export_s, 2),
            "deserialize_seconds": round(deser_s, 3),
            "note": "one-time per-process costs; per-batch-size XLA "
                    "compile happens on first call (same as live jit)",
        },
        "method": f"two-point slope over in-jit fori_loop chains, "
                  f"min-of-{args.repeats}",
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
