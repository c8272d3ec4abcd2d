"""Pallas fused depthwise kernel tests (SURVEY.md §4.4): interpret mode on
CPU vs the XLA reference composition, fp32 exact and grad checks. The
compiled path is exercised on the real chip by bench.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnasnet_tpu.ops.depthwise import _xla_depthwise
from mnasnet_tpu.ops.pallas.dw_conv import (
    depthwise_conv_fused_pallas,
    depthwise_conv_pallas,
)


def _mk(h, w, c, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
    kern = jnp.asarray((rng.standard_normal((k, k, 1, c)) * 0.3).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    return x, kern, scale, bias


@pytest.mark.parametrize("k,stride,hw,c", [
    (3, 1, 16, 32),     # sep-dw-like
    (5, 1, 14, 48),
    (3, 2, 16, 32),
    (5, 2, 28, 24),
    (3, 1, 7, 160),     # head-stage-like: tiny spatial, larger C
    (5, 2, 15, 8),      # odd spatial
])
def test_fused_matches_xla_composition(k, stride, hw, c):
    x, kern, scale, bias = _mk(hw, hw, c, k)
    p = k // 2
    ref = _xla_depthwise(x, kern, stride, p, precision="highest")
    ref = jnp.maximum(ref * scale + bias, 0.0)
    out = depthwise_conv_fused_pallas(
        x, kern, scale, bias, stride=stride, padding=p, relu=True
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_no_relu():
    x, kern, scale, bias = _mk(8, 8, 16, 3)
    ref = _xla_depthwise(x, kern, 1, 1, precision="highest") * scale + bias
    out = depthwise_conv_fused_pallas(
        x, kern, scale, bias, stride=1, padding=1, relu=False
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bf16_io_fp32_accumulate():
    x, kern, scale, bias = _mk(16, 16, 32, 3)
    xb = x.astype(jnp.bfloat16)
    out = depthwise_conv_fused_pallas(
        xb, kern, scale, bias, stride=1, padding=1, relu=True
    )
    assert out.dtype == jnp.bfloat16
    ref = _xla_depthwise(x, kern, 1, 1, precision="highest")
    ref = jnp.maximum(ref * scale + bias, 0.0)
    # bf16 has ~3 decimal digits; fp32 accumulation keeps error ~1 ulp of bf16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )


@pytest.mark.parametrize("k,stride", [(3, 1), (5, 1), (3, 2), (5, 2)])
def test_custom_vjp_matches_xla_grads(k, stride):
    x, kern, _, _ = _mk(12, 12, 16, k, seed=3)
    p = k // 2

    def loss_pallas(x, kern):
        y = depthwise_conv_pallas(x, kern, stride=stride, padding=p)
        return jnp.sum(jnp.sin(y))

    def loss_xla(x, kern):
        y = _xla_depthwise(x, kern, stride, p, precision="highest")
        return jnp.sum(jnp.sin(y))

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, kern)
    gx_r, gk_r = jax.grad(loss_xla, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r), atol=1e-4)


def test_vjp_under_jit_and_value_match():
    x, kern, _, _ = _mk(10, 10, 24, 3, seed=4)

    @jax.jit
    def f(x, kern):
        return depthwise_conv_pallas(x, kern, stride=1, padding=1)

    out = f(x, kern)
    ref = _xla_depthwise(x, kern, 1, 1, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("h,c,k,stride", [(16, 16, 3, 1), (32, 24, 5, 2)])
def test_hybrid_vjp_matches_xla_autodiff(h, c, k, stride):
    """The auto-routed custom-VJP (XLA fwd + tap-wise wgrad) must be
    grad-identical to plain XLA autodiff."""
    from mnasnet_tpu.ops.depthwise import _dw_conv_hybrid

    x, kern, _, _ = _mk(h, h, c, k, seed=9)
    p = k // 2

    def loss_h(x, kern):
        return jnp.sum(jnp.sin(_dw_conv_hybrid(x, kern, stride, p)))

    def loss_x(x, kern):
        return jnp.sum(jnp.sin(_xla_depthwise(x, kern, stride, p,
                                              precision="highest")))

    gx_h, gk_h = jax.grad(loss_h, argnums=(0, 1))(x, kern)
    gx_r, gk_r = jax.grad(loss_x, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_h), np.asarray(gk_r), atol=1e-4)


def test_auto_impl_train_grads_match_xla_impl():
    """Model-level: dw_impl='hybrid' (custom-VJP tap-wise wgrad) vs 'xla'
    must produce the same training gradients."""
    from mnasnet_tpu import MNASNet
    from mnasnet_tpu.train.loss import cross_entropy

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 64, 64, 3)).astype(np.float32)
    )
    labels = jnp.asarray([1, 2])
    m_auto = MNASNet(alpha=0.35, num_classes=8, dw_impl="hybrid")
    m_xla = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla")
    v = m_xla.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m, params):
        logits, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return cross_entropy(logits, labels, 0.1)

    g0 = jax.grad(lambda p: loss(m_auto, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m_xla, p))(v["params"])
    # default (reduced) conv precision on both paths + different wgrad
    # reduction order: ~1e-3 noise; a structural bug would be O(1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3
        ),
        g0, g1,
    )
