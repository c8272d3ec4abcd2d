#!/usr/bin/env python
"""Depthwise-kernel microbenchmark vs roofline (SURVEY.md §4.6).

Runs each dw layer shape of MNASNet-1.0@224 through (a) the Pallas fused
kernel and (b) the XLA lowering, iterated inside one jit (feedback chain) so
per-dispatch latency (~1.7 ms through the axon tunnel) doesn't pollute the
numbers. Reports achieved HBM bandwidth against the v5e roofline (~819 GB/s).

Usage: python tools/bench_dw.py [--iters 30] [--batch 64]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from mnasnet_tpu.ops.depthwise import _xla_depthwise
from mnasnet_tpu.ops.pallas.dw_conv import depthwise_conv_fused_pallas

V5E_HBM_GBS = 819.0

# (H, C, k, stride) for every distinct dw layer of MNASNet-1.0 @224
LAYERS = [
    (112, 32, 3, 1),   # sep
    (112, 48, 3, 2),   # s1.0
    (56, 72, 3, 1),    # s1.1-2
    (56, 72, 5, 2),    # s2.0
    (28, 120, 5, 1),   # s2.1-2
    (28, 240, 5, 2),   # s3.0
    (14, 480, 5, 1),   # s3.1-2
    (14, 480, 3, 1),   # s4.0
    (14, 576, 3, 1),   # s4.1
    (14, 576, 5, 2),   # s5.0
    (7, 1152, 5, 1),   # s5.1-3
    (7, 1152, 3, 1),   # s6.0
]


def bench_chain(op, x, iters_lo=64, iters_hi=256):
    """Per-op time via two-point slope: the axon tunnel adds ~25 ms fixed
    dispatch+sync per jit call, so single-call-divided-by-iters is useless.
    Time a short chain and a long chain once each; slope = per-op cost.

    The loop body re-derives ``x`` through ``lax.optimization_barrier`` so
    (a) the op cannot be hoisted out as loop-invariant, (b) feedback does
    NOT constrain the op's input layout to equal its output layout — an
    earlier ``x ← op(x)`` formulation forced layout coupling and measured
    some shapes 2-10× slower than the same conv inside a real training
    graph — and (c) chained negations cannot algebraically collapse. The
    measured slope includes one fp32-accumulating full read of the output
    (the anti-DCE sum), so reported bandwidth is a mild UNDER-estimate.
    """

    def chained(iters):
        @jax.jit
        def f(x):
            def body(_, acc):
                # barrier ties x's availability to acc: the op becomes
                # iteration-dependent (no hoisting) at zero data-movement cost
                xb, _ = lax.optimization_barrier((x, acc))
                y = op(xb)
                # second barrier forces y to MATERIALIZE (otherwise the
                # anti-DCE reduce fuses into the conv and y is never written
                # — measured 56²x72 at an impossible 1250% of roofline);
                # sum the FULL output — slicing lets XLA shrink the conv (DCE)
                yb, _ = lax.optimization_barrier((y, acc))
                return acc + jnp.sum(yb.astype(jnp.float32))

            return lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        return f

    f_lo, f_hi = chained(iters_lo), chained(iters_hi)
    jax.block_until_ready(f_lo(x))
    jax.block_until_ready(f_hi(x))
    t_lo = t_hi = None
    for _ in range(3):  # tunnel noise is ±2-4 ms per call: take min-of-3
        t0 = time.perf_counter()
        jax.block_until_ready(f_lo(x))
        t = time.perf_counter() - t0
        t_lo = t if t_lo is None else min(t_lo, t)
        t0 = time.perf_counter()
        jax.block_until_ready(f_hi(x))
        t = time.perf_counter() - t0
        t_hi = t if t_hi is None else min(t_hi, t)
    return (t_hi - t_lo) / (iters_hi - iters_lo)


def measure_hbm_ceiling(bytes_target=256 * 1024 * 1024):
    """Measured achievable HBM bandwidth on THIS chip via a big bf16
    negation pass (read + write; the barrier in bench_chain prevents
    algebraic collapse of the chain). The per-layer roofline percentages
    are reported against both this and the 819 GB/s spec."""
    n = bytes_target // 2
    x = jnp.ones((n // 1024, 1024), jnp.bfloat16)
    t = bench_chain(lambda v: -v, x, iters_lo=8, iters_hi=40)
    # bytes: read x + write y + the anti-DCE reduce's read of y ≈ 3 passes
    return 3 * x.size * 2 / t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--json", default=None,
                   help="write the per-layer roofline table to this file")
    p.add_argument("--skip-pallas", action="store_true",
                   help="only measure the production (XLA) path")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    ceiling = measure_hbm_ceiling()
    print(f"backend={jax.default_backend()} batch={args.batch} dtype=bf16 "
          f"measured-HBM-ceiling={ceiling/1e9:.0f} GB/s (spec {V5E_HBM_GBS:.0f})")
    print(f"{'layer':>22} {'pallas':>9} {'xla':>9} {'BW_pallas':>10} "
          f"{'%roof':>6} {'speedup':>8}")

    records = []
    for (h, c, k, s) in LAYERS:
        x = jnp.asarray(
            rng.standard_normal((args.batch, h, h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        kern = jnp.asarray(
            (rng.standard_normal((k, k, 1, c)) * 0.3).astype(np.float32)
        )
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        pad = k // 2

        def op_pallas(x):
            return depthwise_conv_fused_pallas(
                x, kern, scale, bias, stride=s, padding=pad, relu=True
            )

        def op_xla(x):
            y = _xla_depthwise(x, kern, s, pad)
            return jnp.maximum(y * scale.astype(y.dtype) + bias.astype(y.dtype), 0)

        tp = None
        if not args.skip_pallas:
            try:
                tp = bench_chain(op_pallas, x)
            except Exception as e:
                print(f"{h:>4}x{h}x{c:<5} k{k}s{s}  PALLAS-FAIL {type(e).__name__}")
        tx = bench_chain(op_xla, x)
        ho = (h + 2 * pad - k) // s + 1
        out_elems = args.batch * ho * ho * c
        bytes_moved = (x.size + out_elems) * 2      # what the op itself moves
        bytes_actual = (x.size + 2 * out_elems) * 2  # + the anti-DCE reduce
        t_best = min(tp, tx) if tp else tx
        bw_xla = bytes_actual / tx / 1e9
        bw_best = bytes_actual / t_best / 1e9
        bw_p = bytes_actual / tp / 1e9 if tp else float("nan")
        print(
            f"{h:>4}x{h}x{c:<5} k{k}s{s} "
            f"{(tp or float('nan'))*1e6:>8.0f}u {tx*1e6:>8.0f}u "
            f"{bw_p:>9.0f}G {100*bw_best/V5E_HBM_GBS:>5.0f}% "
            f"{(tx/tp if tp else float('nan')):>7.2f}x"
        )
        records.append({
            "layer": f"{h}x{h}x{c}_k{k}s{s}",
            "H": h, "C": c, "k": k, "stride": s, "batch": args.batch,
            "bytes_moved_min": bytes_moved,
            "bytes_actual_incl_harness_read": bytes_actual,
            "xla_us": tx * 1e6,
            "pallas_us": tp * 1e6 if tp else None,
            "production_us": tx * 1e6,  # 'auto' routes dw to XLA (BASELINE.md)
            "achieved_GBps_production": bw_xla,
            "vpu_tap_gops": 2 * k * k * out_elems / 1e9,
            "achieved_vpu_tops": 2 * k * k * out_elems / tx / 1e12,
            "pct_of_spec_819": 100 * bw_xla / V5E_HBM_GBS,
            "pct_of_measured_ceiling": 100 * bw_xla / (ceiling / 1e9),
        })

    if args.json:
        import json

        met = [r for r in records if r["pct_of_measured_ceiling"] >= 90]
        payload = {
            "metric": "fused dw-conv+BN+ReLU achieved HBM bandwidth per layer",
            "batch": args.batch,
            "hbm_spec_GBps": V5E_HBM_GBS,
            "hbm_measured_ceiling_GBps": ceiling / 1e9,
            "note": (
                "bytes_moved_min counts one read of the input plane + one "
                "write of the output plane in bf16 (weights/scale/bias are "
                "negligible); achieved BW = that minimum over measured time, "
                "i.e. a LOWER bound on true DMA efficiency. 'production' is "
                "the dw_impl='auto' route (XLA emitter, see BASELINE.md). "
                f"{len(met)}/{len(records)} layers >=90% of the measured "
                "ceiling; layers below are VPU-tap-compute-bound (k=5) or "
                "too small to hide latency (7x7), not DMA-inefficient — "
                "per-layer physics notes in BASELINE.md."
            ),
            "layers": records,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
