"""Depthwise-conv dispatch: XLA reference path + Pallas fused fast path.

The reference's depthwise convs run through a dedicated CUDA grouped-conv
kernel inside libtorch (SURVEY.md §2.3 N2). The TPU-native equivalent here:

  * ``impl='xla'``   — ``lax.conv_general_dilated`` with
    ``feature_group_count=C``. Always correct; XLA lowers depthwise convs to
    the VPU. This is the autodiff-complete baseline path.
  * ``impl='pallas'`` — hand-written VMEM-resident Pallas kernel
    (``mnasnet_tpu.ops.pallas``) with custom VJP; the fused
    conv+BN+ReLU variant is the contract's centerpiece kernel.
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
    if impl == "pallas" or (impl == "auto" and _pallas_ok(x, kernel, stride)):
        from mnasnet_tpu.ops.pallas.dw_conv import depthwise_conv_pallas

        return depthwise_conv_pallas(x, kernel, stride=stride, padding=padding)
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
