"""M0 golden-parity tests: Flax MNASNet vs published spec (SURVEY.md §4.1a,b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnasnet_tpu import MNASNet, create_model, get_depths
from tests.torch_ref import EXPECTED_PARAMS


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize("alpha", [0.35, 0.5, 0.75, 1.0, 1.3, 1.4])
def test_param_counts_exact(alpha):
    model = MNASNet(alpha=alpha)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    assert n_params(variables["params"]) == EXPECTED_PARAMS[alpha]


def test_depths_alpha_grid():
    # Verified width grid from SURVEY.md §2.1.
    assert get_depths(1.0) == [32, 16, 24, 40, 80, 96, 192, 320]
    assert get_depths(0.5) == [16, 8, 16, 24, 40, 48, 96, 160]
    assert get_depths(0.75) == [24, 16, 24, 32, 64, 72, 144, 240]
    assert get_depths(1.3) == [40, 24, 32, 56, 104, 128, 248, 416]
    assert get_depths(1.4) == [48, 24, 32, 56, 112, 136, 272, 448]


def test_create_model_generic_alpha_names():
    # [B:configs[4]]: the grid reaches 1.4 and arbitrary multiplier
    # spellings construct directly (mnasnet0_9 → alpha 0.9).
    assert create_model("mnasnet1_4").alpha == 1.4
    m = create_model("mnasnet0_9", num_classes=10)
    assert m.alpha == 0.9 and m.num_classes == 10
    with pytest.raises(ValueError, match="unknown arch"):
        create_model("mnasnet_bogus")
    with pytest.raises(ValueError, match="unknown arch"):
        create_model("resnet50")


def test_forward_shapes_and_finite():
    model = create_model("mnasnet1_0")
    x = jnp.ones((2, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_forward_small_resolution():
    # Multiplier/resolution grid support (SURVEY.md §2.4: 96–224px free param).
    model = MNASNet(alpha=0.35, num_classes=10)
    x = jnp.ones((1, 96, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert model.apply(variables, x, train=False).shape == (1, 10)


def test_train_mode_updates_batch_stats():
    model = MNASNet(alpha=0.5)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    old = variables["batch_stats"]["stem_bn"]["mean"]
    new = mutated["batch_stats"]["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_bf16_compute_dtype():
    model = MNASNet(alpha=0.5, dtype=jnp.bfloat16)
    x = jnp.ones((1, 64, 64, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # Params stay fp32 (master copies); logits come back fp32.
    assert variables["params"]["stem_conv"]["kernel"].dtype == jnp.float32
    logits = model.apply(variables, x, train=False)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_remat_model_matches_plain():
    """remat=True must be a pure performance/memory knob: identical params
    tree, identical eval forward, identical train-mode grads."""
    from mnasnet_tpu.train.loss import cross_entropy

    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    labels = jnp.asarray([1, 2])
    m0 = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla")
    m1 = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla", remat=True)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v["params"]) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x, train=False)["params"]
    )

    def loss(m, params):
        logits, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return cross_entropy(logits, labels, 0.1)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g0, g1,
    )


def test_bn_one_pass_close_to_two_pass():
    """one_pass BN (default, +17%% train step) must match two_pass within
    fp32 cancellation noise in both outputs and grads."""
    from mnasnet_tpu.train.loss import cross_entropy

    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((4, 32, 32, 3)).astype(np.float32)
    )
    labels = jnp.asarray([0, 1, 2, 3])
    m1 = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla", bn_stats="one_pass")
    m2 = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla", bn_stats="two_pass")
    v = m1.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m, params):
        logits, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return cross_entropy(logits, labels, 0.1)

    l1 = float(loss(m1, v["params"]))
    l2 = float(loss(m2, v["params"]))
    assert abs(l1 - l2) < 1e-3 * max(abs(l2), 1.0)
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    g2 = jax.grad(lambda p: loss(m2, p))(v["params"])

    def flat(t):
        return np.concatenate([np.ravel(np.asarray(a)) for a in jax.tree.leaves(t)])

    # Random-init + random-data is the cancellation worst case (tiny BN
    # variances); measured ~1.8% here vs 10-100% minibatch gradient noise in
    # real training. A formulation BUG (e.g. missing Bessel, wrong axis)
    # shifts grads at O(1).
    rel = np.linalg.norm(flat(g1) - flat(g2)) / (np.linalg.norm(flat(g2)) + 1e-12)
    assert rel < 5e-2, rel


def test_stem_s2d_exact_equivalence():
    """Space-to-depth stem (models/layers.py:StemConv): identical params,
    identical TRAIN-mode outputs (same MACs, reassociated; s2d is a
    train-only lowering — eval uses the plain conv) — and odd sizes fall
    back."""
    import numpy as np

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    )
    m0 = create_model("mnasnet0_35", precision="highest")
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    m1 = create_model("mnasnet0_35", precision="highest", stem_s2d=True)
    y0, s0 = m0.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    y1, s1 = m1.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    # train-mode batch-stat chains amplify the (mathematically exact)
    # reassociation noise through ~50 layers: allow a few 1e-5.
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=3e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)
    # eval path: identical by construction (plain conv both)
    np.testing.assert_array_equal(
        np.asarray(m0.apply(v, x, train=False)),
        np.asarray(m1.apply(v, x, train=False)),
    )
    # odd sizes fall back to the plain conv in train mode too
    y_odd, _ = m1.apply(v, x[:, :63, :63, :], train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert y_odd.shape == (2, 1000)


def test_pw_lowering_dot_equivalence_and_auto_routing():
    """PointwiseConv lowering (models/layers.py): 'dot' computes the same
    1×1 conv as 'conv' on the SAME params (the (1,1,Cin,Cout) kernel is
    lowering-agnostic, so checkpoints transfer), and 'auto' resolves to
    conv in train mode / dot in eval mode — the per-mode measured-fastest
    routing (BASELINE.md round-4 infer campaign: dot +3% on the bs128
    infer step; train-side dot wgrad measured negative in round 2)."""
    import numpy as np

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    m_conv = create_model("mnasnet0_35", precision="highest")
    v = m_conv.init(jax.random.PRNGKey(0), x, train=False)
    m_dot = create_model("mnasnet0_35", precision="highest",
                         pw_lowering="dot")
    m_auto = create_model("mnasnet0_35", precision="highest",
                          pw_lowering="auto")

    # eval mode: dot ≈ conv (same math, different reduction order) and
    # auto ≡ dot (bitwise — same graph).
    y_conv = np.asarray(m_conv.apply(v, x, train=False))
    y_dot = np.asarray(m_dot.apply(v, x, train=False))
    np.testing.assert_allclose(y_conv, y_dot, atol=3e-4, rtol=1e-4)
    np.testing.assert_array_equal(
        y_dot, np.asarray(m_auto.apply(v, x, train=False)))

    # train mode: auto ≡ conv (bitwise — same graph).
    rngs = {"dropout": jax.random.PRNGKey(1)}
    y0, s0 = m_conv.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs=rngs)
    y1, s1 = m_auto.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs=rngs)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_count_macs_published_grid():
    """Analytic MAC counter against the verified grid (SURVEY.md §2.1)."""
    from mnasnet_tpu.models.mnasnet import count_macs

    assert round(count_macs(1.0, 224) / 1e6, 1) == 314.4
    assert round(count_macs(0.5, 224) / 1e6, 1) == 104.5
    assert round(count_macs(1.3, 224) / 1e6, 1) == 526.4
    assert round(count_macs(0.5, 160) / 1e6, 1) == 53.9
    assert round(count_macs(0.35, 96) / 1e6, 1) == 11.9
    assert round(count_macs(1.4, 224) / 1e6, 1) == 588.8
