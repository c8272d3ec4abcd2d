"""Fused MBConv (inverted-residual) block — single Pallas kernel.

THE TPU-native optimization of this framework. Measured on the target chip,
XLA's per-op lowering is already memory-bound-optimal for each conv in
isolation (tools/bench_dw.py), so per-op Pallas kernels cannot win. What XLA
does NOT do is fuse across the convs: the MBConv block

    pw-expand (×6 channels) → BN → ReLU → dw k×k → BN → ReLU → pw-project
    → BN [+ residual]

writes the 6×-expanded activation to HBM after the expand, reads it for the
dw, writes it again, and reads it for the project — 4 HBM passes over the
largest tensor in the block. This kernel keeps the expanded tensor entirely
in VMEM (every MNASNet plane fits: largest is 114×114×72 bf16 ≈ 1.9 MB):

    HBM traffic = read x + write y + weights   (≈ 4-6× less per block)

Structure per grid cell (one batch sample):
  1. expand matmul on the MXU, row-chunked, fp32 accum → folded-BN affine +
     ReLU in registers → bf16 into a padded VMEM ``mid`` scratch;
  2. dw taps on the VPU from ``mid`` (statically unrolled, fp32 accum) →
     affine + ReLU → straight into the project matmul (MXU) → affine
     [+ residual from the still-resident x plane] → single HBM write.

BN folding: inference running stats fold to per-channel (scale, bias) —
see models/layers.py:BatchNorm.folded. Training keeps the XLA path (batch
stats need cross-sample reductions that break the per-sample grid).
Reference behavior being fused: the `_InvertedResidual` block (SURVEY.md
§2.1); native-equivalent of N1+N2+N3+N4 in one kernel (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _chunk_divisor(total: int, row_bytes: int, budget: int = 96 * 1024) -> int:
    """Largest divisor of ``total`` whose chunk fits ``budget`` bytes."""
    if total * row_bytes <= budget:
        return total
    limit = max(1, budget // row_bytes)
    for h in range(min(limit, total), 0, -1):
        if total % h == 0:
            return h
    return 1


def _mbconv_kernel(
    x_ref, we_ref, se_ref, be_ref, wd_ref, sd_ref, bd_ref,
    wp_ref, sp_ref, bp_ref, o_ref, mid_ref,
    *, k: int, stride: int, padding: int, residual: bool, hch: int, hc: int,
):
    H, W = x_ref.shape[1], x_ref.shape[2]
    Cmid = we_ref.shape[1]
    Ho, Wo = o_ref.shape[1], o_ref.shape[2]
    p = padding

    if p:
        mid_ref[:p] = jnp.zeros_like(mid_ref[:p])
        mid_ref[p + H:] = jnp.zeros_like(mid_ref[p + H:])
        mid_ref[:, :p] = jnp.zeros_like(mid_ref[:, :p])
        mid_ref[:, p + W:] = jnp.zeros_like(mid_ref[:, p + W:])

    se = se_ref[0]
    be = be_ref[0]
    # --- 1. expand matmul (MXU) + BN + ReLU → mid (VMEM) ---
    for h0 in range(0, H, hch):
        hcur = min(hch, H - h0)
        x2d = x_ref[0, h0:h0 + hcur, :, :].reshape(hcur * W, x_ref.shape[3])
        acc = lax.dot_general(
            x2d, we_ref[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(acc * se + be, 0.0)
        mid_ref[p + h0:p + h0 + hcur, p:p + W, :] = (
            y.reshape(hcur, W, Cmid).astype(mid_ref.dtype)
        )

    sd = sd_ref[0]
    bd = bd_ref[0]
    sp = sp_ref[0]
    bp = bp_ref[0]
    # --- 2. dw (VPU) + BN + ReLU → project matmul (MXU) + BN [+res] → out ---
    for h0 in range(0, Ho, hc):
        hcur = min(hc, Ho - h0)
        acc = None
        for dy in range(k):
            for dx in range(k):
                if stride == 1:
                    xs = mid_ref[h0 + dy:h0 + dy + hcur, dx:dx + Wo, :]
                else:
                    # Strided slices lower to unsupported gathers in Mosaic;
                    # reshape-then-index does not. Slice a (2hc, 2Wo) window
                    # with the tap offset baked into the start, then take the
                    # even positions of each axis via reshape.
                    v = mid_ref[
                        2 * h0 + dy:2 * h0 + dy + 2 * hcur,
                        dx:dx + 2 * Wo, :,
                    ]
                    v = v.reshape(hcur, 2, 2 * Wo, Cmid)[:, 0]
                    xs = v.reshape(hcur, Wo, 2, Cmid)[:, :, 0, :]
                term = xs.astype(jnp.float32) * wd_ref[dy, dx, :].astype(jnp.float32)
                acc = term if acc is None else acc + term
        z = jnp.maximum(acc * sd + bd, 0.0)
        z2d = z.reshape(hcur * Wo, Cmid).astype(mid_ref.dtype)
        o = lax.dot_general(
            z2d, wp_ref[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o * sp + bp
        o3 = o.reshape(hcur, Wo, o_ref.shape[3])
        if residual:
            o3 = o3 + x_ref[0, h0:h0 + hcur, :, :].astype(jnp.float32)
        o_ref[0, h0:h0 + hcur, :, :] = o3.astype(o_ref.dtype)


def mbconv_fits_vmem(H, W, Cin, Cmid, Cout, k, stride, dtype_bytes=2,
                     budget=10 * 1024 * 1024) -> bool:
    p = k // 2
    Ho = (H + 2 * p - k) // stride + 1
    mid = (H + 2 * p) * (W + 2 * p) * Cmid * dtype_bytes
    x = H * W * Cin * dtype_bytes
    out = Ho * Ho * Cout * dtype_bytes
    weights = (Cin * Cmid + k * k * Cmid + Cmid * Cout) * dtype_bytes
    # chunk temporaries (fp32) bounded by _chunk_divisor budget ≈ 0.25 MB × ~k²
    return x + mid + out + weights + 4 * 1024 * 1024 < budget


def mbconv_fused(
    x: jax.Array,
    we: jax.Array,   # (Cin, Cmid) expand kernel
    se, be,          # folded expand-BN scale/bias (Cmid,)
    wd: jax.Array,   # (k, k, 1, Cmid) depthwise kernel
    sd, bd,          # folded dw-BN scale/bias (Cmid,)
    wp: jax.Array,   # (Cmid, Cout) project kernel
    sp, bp,          # folded project-BN scale/bias (Cout,)
    *,
    kernel_size: int,
    stride: int,
    residual: bool,
) -> jax.Array:
    """Fused inference MBConv block (see module docstring)."""
    N, H, W, Cin = x.shape
    k = kernel_size
    p = k // 2
    Cmid = we.shape[1]
    Cout = wp.shape[1]
    Ho = (H + 2 * p - k) // stride + 1
    Wo = (W + 2 * p - k) // stride + 1

    cdt = x.dtype
    we_c = we.astype(cdt)
    wd_c = wd.reshape(k, k, Cmid).astype(cdt)
    wp_c = wp.astype(cdt)
    a32 = lambda v: v.reshape(1, -1).astype(jnp.float32)

    hch = _chunk_divisor(H, W * Cmid * 4)
    hc = _chunk_divisor(Ho, Wo * max(Cmid, Cout) * 4)

    full = lambda shape: pl.BlockSpec(shape, lambda n: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    plane = lambda shape: pl.BlockSpec((1, *shape),
                                       lambda n: (n, 0, 0, 0),
                                       memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _mbconv_kernel, k=k, stride=stride, padding=p,
            residual=residual, hch=hch, hc=hc,
        ),
        grid=(N,),
        in_specs=[
            plane((H, W, Cin)),
            full((Cin, Cmid)), full((1, Cmid)), full((1, Cmid)),
            full((k, k, Cmid)), full((1, Cmid)), full((1, Cmid)),
            full((Cmid, Cout)), full((1, Cout)), full((1, Cout)),
        ],
        out_specs=plane((Ho, Wo, Cout)),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, Cout), cdt),
        scratch_shapes=[
            # stride 2 reads (2·Ho + k − 1) rows via the reshape trick, which
            # can exceed H+2p by one on odd extents — size for the max.
            pltpu.VMEM((
                max(H + 2 * p, stride * Ho + k - 1),
                max(W + 2 * p, stride * Wo + k - 1),
                Cmid,
            ), cdt),
        ],
        interpret=_interpret(),
        # Same scoped-vmem pitfall as dw_conv._vmem_headroom: when the whole
        # result tensor fits under the scoped ceiling, XLA stack-allocates it
        # next to the kernel windows and overflows the 16 MiB default (bs16
        # needs 18.03M — caught by the r3 latency sweep). 24 MiB clears the
        # observed Mosaic floor at every batch size without changing blocks.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024
        ),
    )(x, we_c, a32(se), a32(be), wd_c, a32(sd), a32(bd),
      wp_c, a32(sp), a32(bp))


def mbconv_reference(x, we, se, be, wd, sd, bd, wp, sp, bp, *,
                     kernel_size, stride, residual, precision=None):
    """Unfused XLA composition — correctness oracle and fallback."""
    k = kernel_size
    p = k // 2
    C = we.shape[0]
    y = lax.dot_general(x, we.astype(x.dtype), (((3,), (0,)), ((), ())),
                        precision=precision)
    y = jnp.maximum(y * se.astype(y.dtype) + be.astype(y.dtype), 0)
    Cmid = y.shape[-1]
    y = lax.conv_general_dilated(
        y, wd.astype(y.dtype), (stride, stride), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=Cmid, precision=precision,
    )
    y = jnp.maximum(y * sd.astype(y.dtype) + bd.astype(y.dtype), 0)
    y = lax.dot_general(y, wp.astype(y.dtype), (((3,), (0,)), ((), ())),
                        precision=precision)
    y = y * sp.astype(y.dtype) + bp.astype(y.dtype)
    if residual:
        y = y + x
    return y
