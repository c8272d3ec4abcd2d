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


def bench_chain(op, x, iters_lo=20, iters_hi=120):
    """Per-op time via two-point slope: the axon tunnel adds ~25 ms fixed
    dispatch+sync per jit call, so single-call-divided-by-iters is useless.
    Time a short chain and a long chain once each; slope = per-op cost."""

    def chained(iters):
        same_shape = op(x).shape == x.shape

        @jax.jit
        def f(x):
            if same_shape:
                return lax.fori_loop(0, iters, lambda _, x: op(x), x)

            def body2(_, carry):
                x, acc = carry
                y = op(x)
                # sum the FULL output — slicing lets XLA shrink the conv (DCE)
                return (-x, acc + jnp.sum(y.astype(jnp.float32)))

            return lax.fori_loop(0, iters, body2,
                                 (x, jnp.zeros((), jnp.float32)))[1]

        return f

    f_lo, f_hi = chained(iters_lo), chained(iters_hi)
    jax.block_until_ready(f_lo(x))
    jax.block_until_ready(f_hi(x))
    t0 = time.perf_counter()
    jax.block_until_ready(f_lo(x))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f_hi(x))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters_hi - iters_lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} batch={args.batch} dtype=bf16")
    print(f"{'layer':>22} {'pallas':>9} {'xla':>9} {'BW_pallas':>10} "
          f"{'%roof':>6} {'speedup':>8}")

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

        try:
            tp = bench_chain(op_pallas, x)
        except Exception as e:
            print(f"{h:>4}x{h}x{c:<5} k{k}s{s}  PALLAS-FAIL {type(e).__name__}")
            continue
        tx = bench_chain(op_xla, x)
        ho = (h + 2 * pad - k) // s + 1
        bytes_moved = (x.size + args.batch * ho * ho * c) * 2
        bw = bytes_moved / tp / 1e9
        print(
            f"{h:>4}x{h}x{c:<5} k{k}s{s} {tp*1e6:>8.0f}u {tx*1e6:>8.0f}u "
            f"{bw:>9.0f}G {100*bw/V5E_HBM_GBS:>5.0f}% {tx/tp:>7.2f}x"
        )


if __name__ == "__main__":
    main()
