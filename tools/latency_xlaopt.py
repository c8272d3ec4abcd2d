#!/usr/bin/env python
"""Batch-resolved A/B of the tuned infer compile options (VERDICT r4 next
#3; [B:configs[0]] single/small-batch serving).

Round 4 measured the bs128-tuned infer set at bs 1–16 in two SEPARATE
bench_latency runs (LATENCY_XLAOPT_BASE_r04.json vs LATENCY_XLAOPT_OPT_r04.json):
bs1 +40%, bs2 flat,
bs4 −10%, bs8 −17%, bs16 −29% — and then shipped the set unconditionally
anyway. This tool is the decision instrument for the batch ROUTING that
replaced that (utils/xla_options.py INFER_OPTIONS_BATCH_RANGES):

  * per batch size, BOTH configs (bare / tuned) are timed back-to-back in
    one process — interleaved, so tunnel drift hits both sides equally;
  * timing is the two-point slope over in-jit fori_loop chains (min-of-N),
    the noise-floor-robust estimator every r4+ measurement uses;
  * the emitted table records per-bs deltas, the measured-best route per
    size, and the SHIPPED route's delta vs bare
    (``shipped_vs_bare_pct`` — the deliverable criterion: a fleet that
    upgrades must never regress vs a bare compile) and vs the per-session
    best (``shipped_vs_best_pct``, informational).

Emits LATENCY_XLAOPT_r05.json. Run on the real TPU with the chip otherwise
idle: python tools/latency_xlaopt.py
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
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--guard-band", type=float, default=0.02,
                   help="tuned must beat bare by this fraction to be "
                        "routed in (ties go to bare: fewer distinct "
                        "binaries in a serving fleet)")
    p.add_argument("--out",
                   default=os.path.join(REPO, "LATENCY_XLAOPT_r05.json"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.steps import make_predict_fn
    from mnasnet_tpu.utils.xla_options import (
        TPU_STEP_OPTIONS,
        infer_options_for_batch,
    )

    tuned = dict(TPU_STEP_OPTIONS["infer"])
    batches = [int(b) for b in args.batches.split(",")]
    img = args.image_size

    model = create_model(args.arch, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False,
    )
    predict = make_predict_fn(model)

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

    def timed(bs: int, options):
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
            jf = jax.jit(f, compiler_options=options)
            return lambda: jf(x0)

        lo, hi = (32, 128) if bs <= 16 else (8, 32)
        return slope_time(make_chain, lo, hi)

    table = []
    for bs in batches:
        t_bare = timed(bs, None)
        t_tuned = timed(bs, tuned)
        gain = t_bare / t_tuned - 1
        measured_route = "tuned" if gain > args.guard_band else "bare"
        shipped_route = ("tuned" if infer_options_for_batch(bs) else "bare")
        row = {
            "batch": bs,
            "bare_ms": round(t_bare * 1e3, 4),
            "tuned_ms": round(t_tuned * 1e3, 4),
            "tuned_gain_pct": round(100 * gain, 2),
            "measured_route": measured_route,
            "shipped_route": shipped_route,
            "shipped_ms": round(
                (t_tuned if shipped_route == "tuned" else t_bare) * 1e3, 4),
        }
        # The deliverable criterion (VERDICT r4 next #3): the shipped
        # decision must never be measurably worse than BARE — a fleet that
        # upgrades must never regress. (vs the per-session measured best is
        # reported informationally: a flag whose sign flips across sessions
        # — bs4: −10% r04, +2% r05 — ships as bare, and that shows up as a
        # small positive vs_best, not a defect.)
        shipped_t = t_tuned if shipped_route == "tuned" else t_bare
        row["shipped_vs_bare_pct"] = round(100 * (shipped_t / t_bare - 1), 2)
        row["shipped_vs_best_pct"] = round(
            100 * (shipped_t / min(t_bare, t_tuned) - 1), 2)
        table.append(row)
        print(json.dumps(row), flush=True)

    ok = all(r["shipped_vs_bare_pct"] <= 100 * args.guard_band
             for r in table)
    out = {
        "arch": args.arch,
        "image_size": img,
        "dtype": "bfloat16",
        "tuned_set": tuned,
        "guard_band": args.guard_band,
        "method": f"interleaved per-batch bare/tuned, two-point slope over "
                  f"in-jit fori_loop chains, min-of-{args.repeats}",
        "table": table,
        "shipped_route_ok_at_every_batch": ok,
        "note": "shipped_route = utils/xla_options.py "
                "INFER_OPTIONS_BATCH_RANGES at measurement time; ok = "
                "shipped never worse than bare at any batch size "
                "(shipped_vs_bare_pct <= guard band); vs_best is "
                "informational",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"shipped_route_ok_at_every_batch": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
