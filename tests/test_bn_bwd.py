"""Pallas BN+ReLU region backward (ops/pallas/bn_bwd.py) vs XLA autodiff.

The region fusion must be a drop-in replacement for autodiff of the same
forward math (VERDICT r2 item 2a): identical forward, matching dx/dγ/dβ.
Runs in interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnasnet_tpu.models.mnasnet import MNASNet
from mnasnet_tpu.ops.pallas.bn_bwd import bn_relu_train
from mnasnet_tpu.train.optim import create_optimizer
from mnasnet_tpu.train.steps import make_train_step
from mnasnet_tpu.train.state import TrainState


def _ref_bn_relu(x, gamma, beta, eps, stats):
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    if stats == "one_pass":
        var = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean), 0.0
        )
    else:
        var = jnp.mean(jnp.square(x32 - mean), axis=axes)
    inv = gamma * jax.lax.rsqrt(var + eps)
    shift = beta - mean * inv
    return jnp.maximum(x * inv.astype(x.dtype) + shift.astype(x.dtype), 0)


@pytest.mark.parametrize("stats", ["one_pass", "two_pass"])
@pytest.mark.parametrize("shape", [(4, 8, 8, 16), (2, 14, 14, 72)])
def test_bn_relu_region_grads_match_autodiff(stats, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 2.0 + 0.3
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.5, 0.5, shape[-1]), jnp.float32)
    cot = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_region(x, g, b):
        y, _, _ = bn_relu_train(x, g, b, 1e-5, stats)
        return jnp.sum(y * cot)

    def loss_ref(x, g, b):
        return jnp.sum(_ref_bn_relu(x, g, b, 1e-5, stats) * cot)

    y_region = bn_relu_train(x, gamma, beta, 1e-5, stats)[0]
    y_ref = _ref_bn_relu(x, gamma, beta, 1e-5, stats)
    np.testing.assert_allclose(y_region, y_ref, rtol=0, atol=0)

    g_region = jax.grad(loss_region, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b, name in zip(g_region, g_ref, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_bf16_relu_mask_matches_forward_exactly():
    """Under bf16 the kernel must recompute the ReLU mask with the SAME
    compute-dtype expression the forward clamps: an fp32 x̂·γ+β recompute
    disagrees at sign boundaries (12/32768 elements on this fixture) and
    leaks gradient through clamped units. With cot≡1 the region's dβ is the
    fp32-exact per-channel count of unmasked elements, so compare it to the
    count of positive FORWARD outputs — integer-exact; any mask flip shows.
    (Autodiff of the reference is NOT a usable oracle here: it accumulates
    the β-cotangent in bf16 through the shift cast and saturates at 256.)"""
    rng = np.random.default_rng(0)
    shape = (8, 8, 8, 64)
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.5, 0.5, shape[-1]), jnp.float32)

    def loss_region(b):
        y, _, _ = bn_relu_train(x, gamma, b, 1e-5, "two_pass")
        return jnp.sum(y.astype(jnp.float32))

    db_region = jax.grad(loss_region)(beta)
    y = bn_relu_train(x, gamma, beta, 1e-5, "two_pass")[0]
    mask_count = jnp.sum((y > 0).astype(jnp.float32), axis=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(db_region),
                                  np.asarray(mask_count))


def test_model_train_step_grads_match():
    """Whole-model equivalence: one train step with bn_bwd='pallas_region'
    produces the same new params as bn_bwd='xla' (fp32, tolerance for the
    different-but-equivalent backward formula grouping)."""
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, 8), jnp.int32)

    results = []
    for bn_bwd in ("xla", "pallas_region"):
        model = MNASNet(alpha=0.35, num_classes=8, dropout=0.0,
                        dw_impl="xla", bn_stats="two_pass", bn_bwd=bn_bwd,
                        precision="highest")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        tx = create_optimizer("sgd", 0.1, weight_decay=0.0)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx,
            jax.random.PRNGKey(0),
        )
        step = jax.jit(make_train_step(model, tx, 0.1))
        new_state, metrics = step(state, images, labels)
        results.append((new_state, float(metrics["loss"])))

    (sa, la), (sb, lb) = results
    assert abs(la - lb) < 1e-5, (la, lb)  # forward identical
    flat_a = jax.tree.leaves(sa.params)
    flat_b = jax.tree.leaves(sb.params)
    # The region backward is the textbook-grouped formula, autodiff groups
    # differently; stacked over ~50 BNs the per-layer ~1e-7 rounding gap
    # compounds to O(1e-5) on gradients — bound the absolute param drift
    # after one lr=0.1 step instead of per-element relative error.
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4
        )
    # batch_stats identical (forward-only quantities)
    for a, b in zip(jax.tree.leaves(sa.batch_stats),
                    jax.tree.leaves(sb.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_channel_pad_variant_builds_and_steps():
    """channel_pad is a perf experiment knob (VERDICT r2 item 2b): the padded
    model must build and take a train step; widths all become multiples."""
    model = MNASNet(alpha=0.35, num_classes=8, dropout=0.0, dw_impl="xla",
                    channel_pad=64)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    # every BN width (= every derived channel width, incl. MBConv expanded
    # mids) must be a lane multiple; the fixed 1280 head stays as-is
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        variables["params"]
    )[0]:
        name = jax.tree_util.keystr(path)
        if "scale" in name and "head" not in name:
            assert leaf.shape[-1] % 64 == 0, (name, leaf.shape)
    tx = create_optimizer("sgd", 0.1)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(0)
    )
    step = jax.jit(make_train_step(model, tx, 0.1))
    images = jnp.zeros((8, 32, 32, 3), jnp.float32)
    labels = jnp.zeros((8,), jnp.int32)
    new_state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
