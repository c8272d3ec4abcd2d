"""Tap-sum depthwise formulation (impl='taps'/'taps2') equivalence tests.

The taps path is a pure-XLA re-formulation of the depthwise conv whose
autodiff yields the tap-wise wgrad with no custom_vjp boundary (see
ops/depthwise.py). These tests pin (a) forward equivalence to the
conv_general_dilated reference on every MNASNet dw shape class, (b) grad
equivalence of the FULL autodiff (dx and dw) against the reference
formulation, and (c) routing: 'taps2' uses taps only at stride 2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnasnet_tpu.ops.depthwise import (
    _taps_depthwise,
    _xla_depthwise,
    depthwise_conv2d,
)


def _mk(h, w, c, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
    kern = jnp.asarray((rng.standard_normal((k, k, 1, c)) * 0.3).astype(np.float32))
    return x, kern


SHAPES = [
    (3, 1, 16, 32),   # sep-dw-like
    (5, 1, 14, 48),
    (3, 2, 16, 32),
    (5, 2, 28, 24),   # one of the pathological stride-2 wgrad shapes (scaled)
    (3, 1, 7, 160),
    (5, 2, 15, 8),    # odd spatial with stride 2
]


@pytest.mark.parametrize("k,stride,hw,c", SHAPES)
def test_taps_forward_matches_conv(k, stride, hw, c):
    x, kern = _mk(hw, hw, c, k)
    ref = _xla_depthwise(x, kern, stride, k // 2, precision="highest")
    out = _taps_depthwise(x, kern, stride, k // 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("k,stride,hw,c", SHAPES)
def test_taps_grads_match_conv(k, stride, hw, c):
    x, kern = _mk(hw, hw, c, k, seed=1)

    def loss_ref(x, w):
        y = _xla_depthwise(x, w, stride, k // 2, precision="highest")
        return jnp.sum(jnp.sin(y))  # nonlinear head so dx isn't trivial

    def loss_taps(x, w):
        y = _taps_depthwise(x, w, stride, k // 2)
        return jnp.sum(jnp.sin(y))

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    gx, gw = jax.grad(loss_taps, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=2e-3)


def test_taps_bf16_io_fp32_accumulate():
    x, kern = _mk(16, 16, 32, 5)
    out = _taps_depthwise(x.astype(jnp.bfloat16), kern, 1, 2)
    assert out.dtype == jnp.bfloat16
    ref = _xla_depthwise(x, kern, 1, 2, precision="highest")
    # bf16 inputs, fp32 accumulation: error is input-rounding-level only.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.15, rtol=0.05
    )


def test_taps2_routing():
    """'taps2' must equal taps at stride 2 and XLA elsewhere (both are
    equivalent numerically; check dispatch via exact-bitwise comparison)."""
    x, kern = _mk(16, 16, 32, 3, seed=2)
    s2_taps2 = depthwise_conv2d(x, kern, stride=2, impl="taps2")
    s2_taps = _taps_depthwise(x, kern, 2, 1)
    np.testing.assert_array_equal(np.asarray(s2_taps2), np.asarray(s2_taps))
    s1_taps2 = depthwise_conv2d(x, kern, stride=1, impl="taps2")
    s1_xla = _xla_depthwise(x, kern, 1, 1)
    np.testing.assert_array_equal(np.asarray(s1_taps2), np.asarray(s1_xla))


@pytest.mark.parametrize("impl", ["taps", "taps2"])
def test_model_train_forward_with_taps(impl):
    """Whole-model TRAIN-mode forward (the regime taps targets): taps-routed
    logits and updated batch stats match the XLA-routed ones."""
    from mnasnet_tpu import create_model

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 64, 64, 3)).astype(np.float32)
    )
    kw = dict(num_classes=11, dropout=0.0, bn_stats="two_pass")
    m_ref = create_model("mnasnet0_35", dw_impl="xla", **kw)
    variables = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    m_taps = create_model("mnasnet0_35", dw_impl=impl, **kw)
    rngs = {"dropout": jax.random.PRNGKey(1)}
    y_ref, upd_ref = m_ref.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    y, upd = m_taps.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-4)
    ref_leaves = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(upd_ref)[0]
    }
    for p, v in jax.tree_util.tree_flatten_with_path(upd)[0]:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref_leaves[jax.tree_util.keystr(p)]),
            atol=5e-4,
        )
