"""Depthwise-conv dispatch: XLA reference path + Pallas fused fast path.

The reference's depthwise convs run through a dedicated CUDA grouped-conv
kernel inside libtorch (SURVEY.md §2.3 N2). The TPU-native equivalent here:

  * ``impl='xla'``   — ``lax.conv_general_dilated`` with
    ``feature_group_count=C``. Always correct; XLA lowers depthwise convs to
    the VPU. This is the autodiff-complete baseline path.
  * ``impl='pallas'`` — hand-written VMEM-resident Pallas kernel
    (``mnasnet_tpu.ops.pallas``) with custom VJP; the fused
    conv+BN+ReLU variant is the contract's centerpiece kernel.
  * ``impl='taps'``  — pure-XLA tap-sum formulation: the k² kernel taps as
    strided-slice multiplies accumulated in fp32. Same math, *no conv
    emitter and no custom_vjp boundary* — autodiff of this forward yields
    the tap-wise wgrad (the formulation that beats XLA's depthwise wgrad
    emitter by up to 30× per-op on the stride-2 layers) while remaining
    fully fusable with the surrounding BN/ReLU chains. Built to answer
    whether 'hybrid''s e2e loss was purely the custom_vjp fusion barrier.
    MEASURED NEGATIVE e2e (BASELINE.md round 3): 65.9 ms/step vs 15.1
    baseline at bs128 — XLA executes the k² slice-mul-adds as separate
    plane-sized loop fusions (fp32, 2×-wide) instead of the conv emitter's
    windowed VMEM reuse, so forward+backward traffic balloons ~k²×. The
    'hybrid' loss was therefore NOT just the custom_vjp boundary; the
    conv emitter's window reuse is load-bearing. Kept selectable as a
    tested, documented negative.
  * ``impl='taps2'`` — taps for stride-2 layers only (the three wgrads
    DW_ROOFLINE_r02.json shows below roofline), XLA elsewhere. Also
    measured negative (43.9 ms/step, same mechanism).
  * ``impl='auto'``  — pallas on TPU backends when the shape qualifies,
    XLA otherwise (CPU tests, odd shapes).

Layout contract: x is NHWC, kernel is HWIO with I==1 (shape (k, k, 1, C)) —
identical to the converted torch ``(C, 1, k, k)`` weight (SURVEY.md §5.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _xla_depthwise(x, kernel, stride, padding, precision=None):
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=precision,
    )


def _taps_depthwise(x, kernel, stride, padding):
    """Depthwise conv as an explicit k²-tap multiply-accumulate.

    y[n,i,j,c] = Σ_{u,v} xp[n, i·s+u, j·s+v, c] · w[u,v,c]  (xp zero-padded)

    Each tap is a (strided) slice of the padded input times a broadcast
    per-channel weight, accumulated in fp32 (k² bf16 adds would cost
    mantissa; the VPU computes in fp32 regardless, so the accumulator dtype
    is ~free). All ops are elementwise/slice — XLA fuses the whole tap sum
    with the surrounding BN/ReLU into one loop fusion, and autodiff
    produces (a) tap-wise wgrad: Σ_{n,i,j} window·g — plane reductions
    instead of the pathological strided conv-wgrad emitter — and (b)
    tap-wise dx: transpose-of-slice = dilated pad-adds. No custom_vjp
    boundary anywhere, so cross-op fusion is preserved (the thing that
    sank 'hybrid', BASELINE.md round 1/2)."""
    k = kernel.shape[0]
    N, H, W, C = x.shape
    Ho = (H + 2 * padding - k) // stride + 1
    Wo = (W + 2 * padding - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    w32 = kernel.astype(jnp.float32)
    acc = None
    for u in range(k):
        for v in range(k):
            win = lax.slice(
                xp,
                (0, u, v, 0),
                (N, u + (Ho - 1) * stride + 1, v + (Wo - 1) * stride + 1, C),
                (1, stride, stride, 1),
            )
            t = win.astype(jnp.float32) * w32[u, v, 0]
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def dw_transposed_dx(g, kernel, stride, padding, H, W):
    """dL/dx of a depthwise conv: dilate g by stride, correlate with the
    spatially-flipped kernel (transposed conv). High padding carries the
    stride remainder so positions past the last window start get gradient."""
    k = kernel.shape[0]
    C = kernel.shape[-1]
    flipped = jnp.flip(kernel, axis=(0, 1))
    adj_h = (H + 2 * padding - k) % stride
    adj_w = (W + 2 * padding - k) % stride
    dx = lax.conv_general_dilated(
        g,
        flipped.astype(g.dtype),
        window_strides=(1, 1),
        padding=[
            (k - 1 - padding, k - 1 - padding + adj_h),
            (k - 1 - padding, k - 1 - padding + adj_w),
        ],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return dx[:, :H, :W, :]


def dw_grad_weights(x, g, k, stride, padding):
    """dL/dkernel as k² shifted elementwise reductions.

    dw[dy,dx,c] = Σ_{n,i,j} xp[n, i·s+dy, j·s+dx, c] · g[n, i, j, c]

    XLA's native depthwise wgrad lowering is pathologically slow on mid-size
    planes on this chip (measured 1.4-2.0 ms for the 56² layers at bs128 —
    up to 30× slower than this formulation, tools-level race in BASELINE.md);
    the tap unrolling fuses into a handful of multiply-reduce passes.
    """
    N, H, W, C = x.shape
    Ho, Wo = g.shape[1], g.shape[2]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    g32 = g.astype(jnp.float32)
    rows = []
    for dy in range(k):
        cols = []
        for dx in range(k):
            window = lax.slice(
                xp,
                (0, dy, dx, 0),
                (N, dy + (Ho - 1) * stride + 1, dx + (Wo - 1) * stride + 1, C),
                (1, stride, stride, 1),
            ).astype(jnp.float32)
            cols.append(jnp.sum(window * g32, axis=(0, 1, 2)))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows).reshape(k, k, 1, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dw_conv_hybrid(x, kernel, stride, padding):
    return _xla_depthwise(x, kernel, stride, padding)


def _dw_hybrid_fwd(x, kernel, stride, padding):
    return _xla_depthwise(x, kernel, stride, padding), (x, kernel)


def _dw_hybrid_bwd(stride, padding, res, g):
    x, kernel = res
    k = kernel.shape[0]
    dx = dw_transposed_dx(g.astype(x.dtype), kernel, stride, padding,
                          x.shape[1], x.shape[2]).astype(x.dtype)
    dw = dw_grad_weights(x, g, k, stride, padding).astype(kernel.dtype)
    return dx, dw


_dw_conv_hybrid.defvjp(_dw_hybrid_fwd, _dw_hybrid_bwd)


def _hybrid_wins(H: int, k: int, stride: int = 1) -> bool:
    """Shape routing for the custom-VJP wgrad.

    Round-1 finding (BASELINE.md): tap-wise wgrad wins every isolated race
    at 14 ≤ H ≤ 64 (up to 30×) but routing it at *every* such layer made
    the full step slower (custom_vjp boundaries block XLA's cross-op
    fusion). Round-2 in-situ profiling (DW_ROOFLINE_r02.json) shows the
    only dw ops with genuine headroom in the production graph are the
    STRIDE-2 wgrads (112²·48 k3, 56²·72 k5, 28²·240 k5 — 510-686 GB/s),
    so 'hybrid' now routes exactly those three shapes."""
    return stride == 2 and H >= 28


def _pallas_supported(x, kernel, stride) -> bool:
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        return False
    k = kernel.shape[0]
    return k in (3, 5) and stride in (1, 2)


def _pallas_ok(x, kernel, stride) -> bool:
    """'auto' routing policy. Measured on the target v5e (tools/bench_dw.py):
    XLA's depthwise emitter is already memory-bound-optimal per-op (up to
    ~650 GB/s) and beats the standalone Pallas kernel on every MNASNet shape,
    so 'auto' keeps standalone dw on XLA. The Pallas win lives at the block
    level (fused MBConv keeps the 6x-expanded tensor out of HBM — see
    ops/pallas/mbconv.py); explicit impl='pallas' still selects the
    standalone kernel."""
    return False


def depthwise_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    padding: int | None = None,
    impl: str = "auto",
    precision=None,
) -> jax.Array:
    """Depthwise 2-D convolution, NHWC / HWIO(I=1).

    padding defaults to k//2 ("same"-style, the reference's choice for every
    depthwise conv — SURVEY.md §2.1).
    """
    k = kernel.shape[0]
    if padding is None:
        padding = k // 2
    if impl == "xla":
        return _xla_depthwise(x, kernel, stride, padding, precision)
    if impl == "taps" or (impl == "taps2" and stride == 2):
        return _taps_depthwise(x, kernel, stride, padding)
    if impl == "pallas" or (impl == "auto" and _pallas_ok(x, kernel, stride)):
        from mnasnet_tpu.ops.pallas.dw_conv import depthwise_conv_pallas

        return depthwise_conv_pallas(x, kernel, stride=stride, padding=padding)
    if impl == "hybrid" and _hybrid_wins(x.shape[1], k, stride):
        # XLA forward + custom-VJP backward with the tap-wise wgrad. Wins
        # per-op in isolation (up to 30× on the 56² wgrads) but measured
        # SLOWER in the full training graph (20.9 vs 17.7 ms/step at bs128 —
        # the custom_vjp boundary blocks XLA's cross-op fusion/scheduling),
        # so 'auto' stays on plain XLA autodiff. Kept selectable for future
        # XLA versions / other shapes.
        return _dw_conv_hybrid(x, kernel, stride, padding)
    return _xla_depthwise(x, kernel, stride, padding, precision)


def depthwise_conv_bn_relu_fused(
    x: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    stride: int = 1,
    padding: int | None = None,
    relu: bool = True,
    impl: str = "auto",
    precision=None,
) -> jax.Array:
    """Inference-time fused depthwise conv + folded-BN affine + optional ReLU.

    ``scale``/``bias`` are the folded BN factors (see
    ``models.layers.BatchNorm.folded``).
    """
    k = kernel.shape[0]
    if padding is None:
        padding = k // 2
    if impl == "pallas" or (impl == "auto" and _pallas_ok(x, kernel, stride)):
        from mnasnet_tpu.ops.pallas.dw_conv import depthwise_conv_fused_pallas

        return depthwise_conv_fused_pallas(
            x, kernel, scale, bias, stride=stride, padding=padding, relu=relu
        )
    y = _xla_depthwise(x, kernel, stride, padding, precision)
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y
