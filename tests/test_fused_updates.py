"""Fused flat updates (train/optim.py pack_flat machinery) and external BN
EMA (models/layers.py ema='external' + train/steps.py fused_ema_stats):
both must be numerically equivalent to the per-leaf reference paths —
they are TPU small-tensor optimizations, not approximations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnasnet_tpu import create_model
from mnasnet_tpu.train.optim import (
    _wd_mask,
    create_optimizer,
    pack_flat,
    unpack_flat,
)
from mnasnet_tpu.train.state import TrainState
from mnasnet_tpu.train.steps import fused_ema_stats, make_train_step


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    return {
        "conv": {"kernel": jax.random.normal(ks[0], (3, 3, 4, 8))},
        "bn": {"scale": jax.random.normal(ks[1], (8,)),
               "bias": jax.random.normal(ks[2], (8,))},
        "blk": {"dw_kernel": jax.random.normal(ks[3], (3, 3, 1, 8))},
    }


@pytest.mark.parametrize("small_only", [False, True])
def test_pack_unpack_roundtrip(small_only):
    t = _tree()
    packed = pack_flat(t, small_only)
    back = unpack_flat(packed, t, small_only)
    for a, b in zip(jax.tree.leaves(t), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name", ["sgd", "rmsprop"])
@pytest.mark.parametrize("fused", [True, "small"])
def test_fused_optimizer_matches_per_leaf(name, fused):
    params = _tree(1)
    grads = _tree(2)
    ref_tx = create_optimizer(name, 0.1, weight_decay=1e-2)
    new_tx = create_optimizer(name, 0.1, weight_decay=1e-2, fused=fused)
    ref_state = ref_tx.init(params)
    new_state = new_tx.init(params)
    p_ref, p_new = params, params
    for _ in range(3):
        u_ref, ref_state = ref_tx.update(grads, ref_state, p_ref)
        u_new, new_state = new_tx.update(grads, new_state, p_new)
        p_ref = jax.tree.map(lambda p, u: p + u, p_ref, u_ref)
        p_new = jax.tree.map(lambda p, u: p + u, p_new, u_new)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_wd_mask_partition_covers_all_leaves():
    t = _tree()
    marks = jax.tree.leaves(_wd_mask(t))
    assert marks.count(True) == 2  # conv kernel + dw_kernel
    assert marks.count(False) == 2  # bn scale/bias


def test_fused_ema_matches_per_leaf():
    old = {"a": {"mean": jnp.arange(4.0), "var": jnp.ones(4)},
           "b": {"mean": jnp.full(3, 2.0), "var": jnp.full(3, 0.5)}}
    new = jax.tree.map(lambda x: x + 1.0, old)
    decay = 0.9997
    got = fused_ema_stats(old, new, decay)
    want = jax.tree.map(lambda o, n: decay * o + (1 - decay) * n, old, new)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_external_ema_train_step_equivalent():
    """Whole-step equivalence: (bn_ema='external' + fused ema in the step)
    vs the module-internal EMA path, same seeds/data."""
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    labels = jnp.arange(4, dtype=jnp.int32) % 10

    def run(bn_ema, fused):
        model = create_model("mnasnet0_35", num_classes=10, bn_ema=bn_ema)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        tx = create_optimizer("rmsprop", 0.05, fused=fused)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx,
            jax.random.PRNGKey(0),
        )
        step = jax.jit(make_train_step(model, tx, 0.1))
        for _ in range(2):
            state, metrics = step(state, imgs, labels)
        return state, metrics

    s_ref, m_ref = run("module", False)
    s_new, m_new = run("external", "small")
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_new["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_new.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(
        jax.tree.leaves(s_ref.batch_stats), jax.tree.leaves(s_new.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("bn_ema", ["module", "external"])
def test_bn_momentum_knob_respected(bn_ema):
    """bn_momentum must govern the running-stat EMA in BOTH ema modes
    (the external path reads it via steps._ema_outside)."""
    imgs = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3)) * 2 + 1
    labels = jnp.zeros((8,), jnp.int32)
    model = create_model("mnasnet0_35", num_classes=4, bn_ema=bn_ema,
                         bn_momentum=0.5)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    tx = create_optimizer("sgd", 0.0, weight_decay=0.0)
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, 0.0))
    state1, _ = step(state, imgs, labels)
    # lr=0 → weights unchanged → batch stats identical next step; after one
    # step running = 0.5*init + 0.5*batch, after two = 0.25*init+0.75*batch.
    state2, _ = step(state1, imgs, labels)
    m0 = v["batch_stats"]["stem_bn"]["mean"]          # init (zeros)
    m1 = state1.batch_stats["stem_bn"]["mean"]
    m2 = state2.batch_stats["stem_bn"]["mean"]
    batch = m1 * 2.0                                   # solve 0.5*0+0.5*b
    np.testing.assert_allclose(np.asarray(m2),
                               np.asarray(0.25 * m0 + 0.75 * batch),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(m1).max()) > 1e-3  # stats actually moved
