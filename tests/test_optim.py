"""Optimizer semantics tests (SURVEY.md §7 hard-part 3: TF-vs-torch RMSProp
and wd-masking are silent top-1 traps)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mnasnet_tpu.train.optim import create_optimizer, rmsprop_tf, sgd


def tree_close(a, b, atol=1e-6):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(x, y, atol=atol), a, b)


def test_sgd_matches_torch():
    # Coupled wd + momentum: must track torch.optim.SGD exactly on 'kernel'
    # params (wd applies) over several steps.
    w0 = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    params = {"dense": {"kernel": jnp.asarray(w0)}}

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=1e-2)

    tx = sgd(0.1, momentum=0.9, weight_decay=1e-2)
    opt_state = tx.init(params)
    for step in range(5):
        g = np.random.default_rng(step + 1).standard_normal((4, 3)).astype(np.float32)
        grads = {"dense": {"kernel": jnp.asarray(g)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    np.testing.assert_allclose(
        np.asarray(params["dense"]["kernel"]), tw.detach().numpy(), atol=1e-6
    )


def test_sgd_wd_skips_bn_and_bias():
    params = {
        "conv": {"kernel": jnp.ones((2, 2))},
        "bn": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
        "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
    }
    tx = sgd(1.0, momentum=0.0, weight_decay=0.5)
    zeros = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, tx.init(params), params)
    # wd applies to kernels only: update = -lr * wd * p = -0.5
    assert np.allclose(updates["conv"]["kernel"], -0.5)
    assert np.allclose(updates["dense"]["kernel"], -0.5)
    assert np.allclose(updates["bn"]["scale"], 0.0)
    assert np.allclose(updates["bn"]["bias"], 0.0)
    assert np.allclose(updates["dense"]["bias"], 0.0)


def test_rmsprop_tf_semantics():
    # Hand-rolled TF1 RMSProp reference: eps INSIDE the sqrt, and the
    # mean_square slot initialized to ONES (TF1's ones_initializer — keeps
    # the first updates ≈ lr·g instead of a 3.16·lr·sign(g) kick).
    decay, momentum, eps, lr = 0.9, 0.9, 1e-3, 0.01
    w = np.full((3,), 0.5, np.float32)
    ms = np.ones_like(w)
    mom = np.zeros_like(w)

    params = {"k": {"kernel": jnp.asarray(w.copy())}}
    tx = rmsprop_tf(lr, decay=decay, momentum=momentum, eps=eps, weight_decay=0.0)
    st = tx.init(params)

    rng = np.random.default_rng(7)
    for _ in range(6):
        g = rng.standard_normal(3).astype(np.float32)
        ms = decay * ms + (1 - decay) * g * g
        mom = momentum * mom + lr * g / np.sqrt(ms + eps)
        w = w - mom

        updates, st = tx.update({"k": {"kernel": jnp.asarray(g)}}, st, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["k"]["kernel"]), w, atol=1e-6)


def test_rmsprop_differs_from_torch_eps_outside():
    # Guard: TF semantics must NOT match torch's eps-outside variant. With
    # the ms slot starting at ones the two coincide early (ms≈1 dominates
    # eps), so iterate with small gradients until ms decays to O(eps),
    # where eps-inside vs eps-outside visibly separate.
    lr, decay, momentum, eps = 0.01, 0.9, 0.9, 1e-3
    g = np.full((3,), 0.01, np.float32)

    params = {"k": {"kernel": jnp.zeros((3,), jnp.float32)}}
    tx = rmsprop_tf(lr, decay=decay, momentum=momentum, eps=eps, weight_decay=0.0)
    st = tx.init(params)
    ms = np.ones(3, np.float32)
    mom_tf = np.zeros(3, np.float32)
    mom_torch = np.zeros(3, np.float32)
    for _ in range(120):
        updates, st = tx.update({"k": {"kernel": jnp.asarray(g)}}, st, params)
        ms = decay * ms + (1 - decay) * g * g
        mom_tf = momentum * mom_tf + lr * g / np.sqrt(ms + eps)
        mom_torch = momentum * mom_torch + lr * g / (np.sqrt(ms) + eps)
    ours = np.asarray(updates["k"]["kernel"])
    np.testing.assert_allclose(ours, -mom_tf, rtol=1e-5)
    assert not np.allclose(ours, -mom_torch, rtol=0.05)


def test_create_optimizer_names():
    import pytest

    create_optimizer("sgd", 0.1)
    create_optimizer("rmsprop", 0.1)
    with pytest.raises(ValueError):
        create_optimizer("adamw", 0.1)


# ------------------------------------------------------------- model EMA
def test_model_ema_tf_semantics():
    """with_model_ema must reproduce tf.train.ExponentialMovingAverage:
    shadow init = initial values; per update shadow -= (1-d)(shadow-param)
    with d = min(decay, (1+n)/(10+n)) under the num_updates warmup."""
    from mnasnet_tpu.train.optim import get_ema_params, with_model_ema

    import optax

    decay = 0.9999
    params = {"w": jnp.array([1.0, -2.0]), "b": jnp.array([0.5])}
    tx = with_model_ema(optax.sgd(0.1), decay)
    state = tx.init(params)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)),
        get_ema_params(state), params))

    shadow = jax.tree.map(jnp.array, params)
    p = params
    for n in range(1, 4):
        grads = jax.tree.map(lambda x: 0.3 * jnp.ones_like(x), p)
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
        d = min(decay, (1.0 + n) / (10.0 + n))
        shadow = jax.tree.map(
            lambda e, q: e - (1.0 - d) * (e - q), shadow, p)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6),
            get_ema_params(state), shadow)
    # inner sgd still applied normally
    np.testing.assert_allclose(
        np.asarray(p["w"]), np.asarray(params["w"]) - 3 * 0.1 * 0.3,
        rtol=1e-6)


def test_model_ema_via_create_optimizer_fused():
    """EMA wraps OUTSIDE the fused/packed optimizer: shadow tree has the
    real param structure and get_ema_params finds it; checkpoint-raw
    (namedtuples-as-dicts) form also resolves."""
    from mnasnet_tpu.train.optim import get_ema_params

    import optax

    params = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 8))},
        "bn": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }
    tx = create_optimizer("rmsprop", 0.01, fused="small", model_ema=0.999)
    state = tx.init(params)
    ema = get_ema_params(state)
    assert jax.tree.structure(ema) == jax.tree.structure(params)
    grads = jax.tree.map(jnp.ones_like, params)
    _, state2 = tx.update(grads, state, params)
    ema2 = get_ema_params(state2)
    assert jax.tree.structure(ema2) == jax.tree.structure(params)
    assert not bool(jnp.all(ema2["conv"]["kernel"] == params["conv"]["kernel"]))

    # raw (template-free restore) form: namedtuples become dicts
    def rawify(node):
        if hasattr(node, "_asdict"):
            return {k: rawify(v) for k, v in node._asdict().items()}
        if isinstance(node, dict):
            return {k: rawify(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [rawify(v) for v in node]
        return node

    ema_raw = get_ema_params(rawify(state2))
    np.testing.assert_allclose(
        np.asarray(ema_raw["conv"]["kernel"]),
        np.asarray(ema2["conv"]["kernel"]))

    # no EMA configured -> None
    tx2 = create_optimizer("sgd", 0.1)
    assert get_ema_params(tx2.init(params)) is None
