"""Pallas TPU depthwise-conv kernels with fused BN-affine + ReLU.

The centerpiece kernel of the rebuild contract ([B:north_star]: "depthwise-
separable convs compile to fused Pallas kernels with BatchNorm+ReLU folding in
bf16") — the TPU-native replacement for the reference's CUDA grouped-conv +
cuDNN-BN + ReLU kernel sequence (SURVEY.md §2.3 N2/N3).

Design (see /opt/skills/guides/pallas_guide.md):
  * NHWC with C on the 128-lane axis — the only VPU-viable layout.
  * Grid (N, C-blocks); each cell loads one padded spatial plane into VMEM.
    Every MNASNet dw layer plane fits VMEM with room to spare (largest:
    114×114×72 bf16 ≈ 1.9 MB; VMEM is ~16 MB), so there is no halo logic —
    the pipeline double-buffers whole planes while the VPU runs k² fused
    multiply-adds.
  * Taps statically unrolled (k ∈ {3,5}); accumulation in fp32; folded BN
    scale/bias and ReLU applied in-register before the single bf16 store.
    One HBM read of x + one write of y — the op runs at the memory roofline.
  * stride 2 via parity-plane decomposition: x[2i+dy] = x_sub[dy%2][i+dy//2],
    so each of the 4 subsampled planes is consumed with stride-1 shifts —
    no strided VMEM access, which Mosaic lowers poorly.
  * training path: custom VJP. dx is itself a (dilated) depthwise correlation
    with the flipped kernel and dw is a per-channel spatial reduction — both
    expressed with XLA's conv_general_dilated which lowers well for the
    backward shapes; the forward stays Pallas.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Compiled Mosaic on real TPU; interpreter elsewhere (CPU tests).
    return jax.default_backend() not in ("tpu", "axon")


def _pick_c_block(C: int, plane_elems: int) -> int:
    """Channel-block size: whole C when the fp32 accumulator plane fits VMEM
    comfortably, else 128-lane chunks."""
    if C * plane_elems * 4 <= 6 * 1024 * 1024:
        return C
    for cb in (512, 256, 128):
        if C % cb == 0:
            return cb
    return min(C, 128)


# --------------------------------------------------------------------------
# stride-1 kernel
# --------------------------------------------------------------------------
def _dw_s1_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, pad_ref, *, k: int,
                  relu: bool, hc: int, padding: int):
    """Stride-1 fused dw conv.

    Padding is materialized in a VMEM scratch (zero borders + interior copy)
    instead of an XLA-side jnp.pad — that saves a full HBM read+write of x,
    which measured ~2× on the large planes. Output rows are processed in
    static chunks of ``hc`` so the fp32 accumulator and Mosaic's shifted tap
    operands stay register-resident; all slices are static.
    """
    H, W = x_ref.shape[1], x_ref.shape[2]
    Ho, Wo = o_ref.shape[1], o_ref.shape[2]
    p = padding
    if p:
        # zero only the borders, then copy the interior
        pad_ref[:p] = jnp.zeros_like(pad_ref[:p])
        pad_ref[p + H:] = jnp.zeros_like(pad_ref[p + H:])
        pad_ref[:, :p] = jnp.zeros_like(pad_ref[:, :p])
        pad_ref[:, p + W:] = jnp.zeros_like(pad_ref[:, p + W:])
    pad_ref[p:p + H, p:p + W, :] = x_ref[0]

    scale = s_ref[0].astype(jnp.float32)
    bias = b_ref[0].astype(jnp.float32)
    for h0 in range(0, Ho, hc):
        hcur = min(hc, Ho - h0)
        acc = None
        for dy in range(k):
            for dx in range(k):
                xs = pad_ref[h0 + dy:h0 + dy + hcur, dx:dx + Wo, :].astype(jnp.float32)
                term = xs * w_ref[dy, dx, :].astype(jnp.float32)
                acc = term if acc is None else acc + term
        y = acc * scale + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, h0:h0 + hcur, :, :] = y.astype(o_ref.dtype)


# --------------------------------------------------------------------------
# stride-2 kernel (4 parity planes)
# --------------------------------------------------------------------------
def _dw_s2_kernel(x00, x01, x10, x11, w_ref, s_ref, b_ref, o_ref,
                  *, k: int, relu: bool, hc: int):
    subs = {(0, 0): x00, (0, 1): x01, (1, 0): x10, (1, 1): x11}
    Ho, Wo = o_ref.shape[1], o_ref.shape[2]
    scale = s_ref[0].astype(jnp.float32)
    bias = b_ref[0].astype(jnp.float32)

    def chunk(ci, _):
        h0 = ci * hc
        acc = None
        for dy in range(k):
            for dx in range(k):
                a, b, u, v = dy % 2, dx % 2, dy // 2, dx // 2
                xs = subs[(a, b)][0, pl.ds(h0 + u, hc), v:v + Wo, :].astype(jnp.float32)
                term = xs * w_ref[dy, dx, :].astype(jnp.float32)
                acc = term if acc is None else acc + term
        y = acc * scale + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, pl.ds(h0, hc), :, :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, Ho // hc, chunk, 0)


def _vmem_headroom():
    """Scoped-vmem ceiling for the dw kernels: 24 MiB.

    The kernels' own windows are small (~4 MiB; _ACC_BUDGET chunking). But
    whenever the WHOLE result tensor fits under the scoped limit (e.g.
    bs16 x 112x112x32 bf16 = 12.8 MiB), XLA stack-allocates it in scoped
    vmem next to the kernel windows and can overflow the ceiling — a
    mid-batch-size-only compile failure sitting between the small serving
    shapes and the bs>=64 throughput shapes (caught by the r3 latency
    sweep; Mosaic reported an 18.03M requirement against the 16M default).
    Empirically (bs 1..128 swept on the v5e) 24 MiB is above the observed
    requirement at every batch size, while 16M fails at bs16, 8M at bs64,
    and 64M re-breaks bs64/128 by legalising even larger stack placements.
    Block shapes are unchanged by this parameter.
    """
    return pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024)


def _plane_spec(shape_hw, cb, rank4=True):
    # block (1, H, W, cb) at grid point (n, c)
    return pl.BlockSpec(
        (1, shape_hw[0], shape_hw[1], cb),
        lambda n, c: (n, 0, 0, c),
        memory_space=pltpu.VMEM,
    )


# Target size for the fp32 accumulator of one in-kernel row chunk. Mosaic
# materializes the shifted tap operands, so the working set is a small
# multiple of this.
_ACC_BUDGET_BYTES = 256 * 1024


def _pick_chunk(Ho: int, Wo: int, cb: int) -> int:
    """In-kernel output-row chunk height: whole plane when small, else the
    largest divisor of Ho whose fp32 chunk fits the budget (divisibility
    keeps the fori_loop exact — MNASNet planes are 7/8-smooth)."""
    if Ho * Wo * cb * 4 <= _ACC_BUDGET_BYTES:
        return Ho
    limit = max(1, _ACC_BUDGET_BYTES // (Wo * cb * 4))
    for hc in range(min(limit, Ho), 0, -1):
        if Ho % hc == 0:
            return hc
    return 1


def _dw_fused_raw(
    x: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    stride: int,
    padding: int,
    relu: bool,
) -> jax.Array:
    """Fused depthwise conv + affine + optional ReLU (no autodiff)."""
    N, H, W, C = x.shape
    k = kernel.shape[0]
    Ho = (H + 2 * padding - k) // stride + 1
    Wo = (W + 2 * padding - k) // stride + 1

    w = kernel.reshape(k, k, C)
    s2 = scale.reshape(1, C)
    b2 = bias.reshape(1, C)

    cb = _pick_c_block(C, Ho * Wo)
    hc = _pick_chunk(Ho, Wo, cb)

    grid = (N, pl.cdiv(C, cb))
    w_spec = pl.BlockSpec((k, k, cb), lambda n, c: (0, 0, c),
                          memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec((1, cb), lambda n, c: (0, c),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Ho, Wo, cb), lambda n, c: (n, 0, 0, c),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, Ho, Wo, C), x.dtype)

    if stride == 1:
        return pl.pallas_call(
            functools.partial(_dw_s1_kernel, k=k, relu=relu, hc=hc,
                              padding=padding),
            grid=grid,
            in_specs=[
                _plane_spec((H, W), cb),
                w_spec, sb_spec, sb_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((H + 2 * padding, W + 2 * padding, cb), x.dtype)
            ],
            interpret=_interpret(),
            compiler_params=_vmem_headroom(),
        )(x, w, s2, b2)

    if stride == 2:
        xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        # Parity planes, each padded up so every tap's stride-1 window fits:
        # plane (a,b) needs Ho−1 + (k−1−a)//2 + 1 rows.
        planes = []
        specs = []
        for a in (0, 1):
            for b in (0, 1):
                sub = xp[:, a::2, b::2, :]
                need_h = Ho + (k - 1 - a) // 2
                need_w = Wo + (k - 1 - b) // 2
                ph = max(0, need_h - sub.shape[1])
                pw = max(0, need_w - sub.shape[2])
                if ph or pw:
                    sub = jnp.pad(sub, ((0, 0), (0, ph), (0, pw), (0, 0)))
                planes.append(sub)
                specs.append(_plane_spec(sub.shape[1:3], cb))
        return pl.pallas_call(
            functools.partial(_dw_s2_kernel, k=k, relu=relu, hc=hc),
            grid=grid,
            in_specs=[*specs, w_spec, sb_spec, sb_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=_interpret(),
            compiler_params=_vmem_headroom(),
        )(*planes, w, s2, b2)

    raise NotImplementedError(f"stride {stride}")


# --------------------------------------------------------------------------
# autodiff wrappers
# --------------------------------------------------------------------------
def _dw_xla(x, kernel, stride, padding):
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dw_conv(x, kernel, stride, padding):
    ones = jnp.ones((x.shape[-1],), jnp.float32)
    zeros = jnp.zeros((x.shape[-1],), jnp.float32)
    return _dw_fused_raw(x, kernel, ones, zeros,
                         stride=stride, padding=padding, relu=False)


def _dw_conv_fwd(x, kernel, stride, padding):
    return _dw_conv(x, kernel, stride, padding), (x, kernel)


def _dw_conv_bwd(stride, padding, res, g):
    from mnasnet_tpu.ops.depthwise import dw_grad_weights, dw_transposed_dx

    x, kernel = res
    k = kernel.shape[0]
    dx = dw_transposed_dx(g.astype(x.dtype), kernel, stride, padding,
                          x.shape[1], x.shape[2]).astype(x.dtype)
    dw = dw_grad_weights(x, g, k, stride, padding).astype(kernel.dtype)
    return dx, dw


_dw_conv.defvjp(_dw_conv_fwd, _dw_conv_bwd)


# --------------------------------------------------------------------------
# public entry points (called from mnasnet_tpu.ops.depthwise)
# --------------------------------------------------------------------------
def depthwise_conv_pallas(x, kernel, *, stride, padding):
    """Differentiable depthwise conv: Pallas forward, custom-VJP backward."""
    return _dw_conv(x, kernel, stride, padding)


def depthwise_conv_fused_pallas(x, kernel, scale, bias, *, stride, padding,
                                relu=True):
    """Inference-fused dw conv + folded-BN affine + ReLU (single kernel)."""
    return _dw_fused_raw(
        x, kernel, scale, bias, stride=stride, padding=padding, relu=relu
    )
