"""Pallas TPU depthwise-conv kernels (fused BN+ReLU variant included).

Implemented in milestone M4 (SURVEY.md §7). Until then these wrappers fall
back to the XLA path so the dispatch layer stays importable on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depthwise_conv_pallas(x, kernel, *, stride, padding):
    from mnasnet_tpu.ops.depthwise import _xla_depthwise

    return _xla_depthwise(x, kernel, stride, padding)


def depthwise_conv_fused_pallas(x, kernel, scale, bias, *, stride, padding, relu):
    from mnasnet_tpu.ops.depthwise import _xla_depthwise

    y = _xla_depthwise(x, kernel, stride, padding)
    y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y
