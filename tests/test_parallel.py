"""Data-parallel correctness on the 8-device virtual CPU mesh (SURVEY.md
§4.3): the DDP-equivalence invariant — a sharded-batch step must produce the
same new params as a single-device step on the concatenated batch — plus
sharding/placement checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnasnet_tpu import MNASNet
from mnasnet_tpu.parallel.mesh import (
    batch_sharding,
    label_sharding,
    make_mesh,
    replicate_state,
)
from mnasnet_tpu.train.optim import create_optimizer
from mnasnet_tpu.train.trainer import Trainer

IMG = 32


def _data(batch=16):
    rng = np.random.default_rng(0)
    images = rng.standard_normal((batch, IMG, IMG, 3)).astype(np.float32)
    labels = rng.integers(0, 8, batch).astype(np.int32)
    return images, labels


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"


@pytest.mark.parametrize("ndev", [8])
def test_ddp_equivalence(ndev):
    """Grads/params after one sharded step == single-device step on the same
    global batch (the invariant DDP provides via NCCL allreduce, here via
    GSPMD — SURVEY.md §2.5)."""
    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                    precision="highest", bn_stats="two_pass")
    tx = create_optimizer("sgd", 0.1, weight_decay=0.0)

    images, labels = _data(16)

    results = []
    for devices in (jax.devices()[:1], jax.devices()[:ndev]):
        mesh = make_mesh(devices)
        trainer = Trainer(model, tx, mesh=mesh, label_smoothing=0.1,
                          print_freq=1000)
        state = trainer.create_state(jax.random.PRNGKey(0), IMG)
        state, metrics = trainer._train_step(
            state, jnp.asarray(images), jnp.asarray(labels)
        )
        results.append((state, metrics))

    (s1, m1), (s8, m8) = results
    # Train-mode BN gradients amplify fp32 reduction-order noise by 1/sigma,
    # so per-element closeness is ill-conditioned on a random model. The
    # invariant tested here: the parameter UPDATE vectors agree to <2% in
    # norm (a missing allreduce or per-shard BN shifts updates by O(50-100%));
    # the tight per-element invariant lives in
    # test_grad_equivalence_eval_mode.
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)

    model2 = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                     precision="highest")
    p0 = model2.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, IMG, IMG, 3)), train=False)["params"]

    def flat(tree):
        return np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree.leaves(tree)])

    d1 = flat(s1.params) - flat(p0)
    d8 = flat(s8.params) - flat(p0)
    rel = np.linalg.norm(d1 - d8) / np.linalg.norm(d1)
    assert rel < 0.02, f"update vectors diverge: {rel:.4f}"
    # sync-BN: batch stats must be global, not per-shard. Stats are O(1)
    # bounded, so absolute tolerance is well-conditioned here (measured
    # cross-mesh diff ~1e-7; per-shard stats would differ at ~3e-4·|batch
    # mean spread| through the EMA, orders above this bound).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s1.batch_stats, s8.batch_stats,
    )


def test_grad_equivalence_eval_mode():
    """The tight DDP invariant: with BN in running-stats mode (removing the
    1/sigma noise amplifier), sharded-batch grads must equal single-device
    grads to fp32 reduction-order precision (~1e-6)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mnasnet_tpu.train.loss import cross_entropy

    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                    precision="highest", bn_stats="two_pass")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False
    )
    images, labels = _data(16)

    def loss_fn(params, im, lb):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            im, train=False,
        )
        return cross_entropy(logits, lb, 0.1)

    grads = []
    for devices in (jax.devices()[:1], jax.devices()[:8]):
        mesh = make_mesh(devices)
        repl = NamedSharding(mesh, P())
        gfn = jax.jit(
            jax.grad(loss_fn),
            in_shardings=(repl, batch_sharding(mesh), label_sharding(mesh)),
            out_shardings=repl,
        )
        grads.append(jax.device_get(gfn(
            jax.device_put(variables["params"], repl),
            jax.device_put(jnp.asarray(images), batch_sharding(mesh)),
            jax.device_put(jnp.asarray(labels), label_sharding(mesh)),
        )))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        grads[0], grads[1],
    )


def test_batch_actually_sharded():
    mesh = make_mesh(jax.devices())
    images = np.zeros((16, IMG, IMG, 3), np.float32)
    sharded = jax.device_put(images, batch_sharding(mesh))
    # 8 data shards of 2 samples each
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, IMG, IMG, 3)


def test_replicated_state_on_all_devices():
    mesh = make_mesh(jax.devices())
    tree = {"w": jnp.ones((4, 4))}
    repl = replicate_state(mesh, tree)
    assert len(repl["w"].addressable_shards) == 8
    assert repl["w"].addressable_shards[0].data.shape == (4, 4)


def _trainers_for_bn_modes(dropout=0.0):
    """(sync_bn trainer, local-BN trainer) on the full 8-device mesh."""
    model = MNASNet(alpha=0.35, num_classes=8, dropout=dropout,
                    dw_impl="xla", precision="highest", bn_stats="two_pass")
    tx = create_optimizer("sgd", 0.1, weight_decay=0.0)
    mesh = make_mesh(jax.devices())
    mk = lambda sync: Trainer(model, tx, mesh=mesh, label_smoothing=0.1,
                              print_freq=1000, sync_bn=sync)
    return mk(True), mk(False)


def test_local_bn_normalizes_with_shard_stats():
    """--no-sync-bn unit semantics: under shard_map, BatchNorm must
    normalize each shard with its OWN statistics (the reference's per-GPU
    DDP behavior), verified against a numpy per-shard oracle. (A full-model
    logits comparison is not usable here: at 1x1 feature maps BN reduces
    over 2 values, and the net is chaotically sensitive — measured drift
    persists even in fp64.)"""
    from jax.sharding import PartitionSpec as P

    from mnasnet_tpu.models.layers import BatchNorm

    mesh = make_mesh(jax.devices())
    bn = BatchNorm(features=8, stats="two_pass")
    variables = bn.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 8)),
                        use_running_average=False)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 4, 4, 8)).astype(np.float32)
    # make shard distributions very different
    x += np.arange(16, dtype=np.float32)[:, None, None, None]

    def per_shard(v, xs):
        y, mut = bn.apply(v, xs, use_running_average=False,
                          mutable=["batch_stats"])
        return y, jax.lax.pmean(mut["batch_stats"], "data")

    sharded = jax.shard_map(
        per_shard, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=(P("data"), P()), check_vma=False,
    )
    y, stats = jax.jit(sharded)(variables, jnp.asarray(x))
    y = np.asarray(y)

    shard_means = []
    for i in range(8):  # numpy oracle, shard by shard
        xs = x[2 * i:2 * i + 2]
        m = xs.mean(axis=(0, 1, 2))
        v = xs.var(axis=(0, 1, 2))
        expect = (xs - m) / np.sqrt(v + 1e-5)
        np.testing.assert_allclose(y[2 * i:2 * i + 2], expect, atol=1e-5)
        shard_means.append(m)
    # running stats: EMA toward the cross-shard MEAN of local batch means
    expect_mean = 0.9997 * 0.0 + 0.0003 * np.mean(shard_means, axis=0)
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), expect_mean, atol=1e-7
    )


def test_local_bn_step_plumbing_matches_sync_on_replicated_shards():
    """Full local-BN train step vs sync step when every device's shard holds
    the SAME two samples: per-shard stats equal global stats, so the two
    paths compute the same math. Compared via update-vector norms at 64px
    (same methodology/tolerance as test_ddp_equivalence: per-element
    equality is ill-conditioned — BN's 1/sigma amplifies fp reduction-order
    noise between differently-compiled programs, pathologically so at 1x1
    feature maps)."""
    img = 64
    model = MNASNet(alpha=0.35, num_classes=8, dropout=0.0,
                    dw_impl="xla", precision="highest", bn_stats="two_pass")
    tx = create_optimizer("sgd", 0.1, weight_decay=0.0)
    mesh = make_mesh(jax.devices())
    rng = np.random.default_rng(1)
    shard = rng.standard_normal((2, img, img, 3)).astype(np.float32)
    images = np.tile(shard, (8, 1, 1, 1))  # shard i == shard j
    labels = np.tile(np.asarray([3, 5], np.int32), 8)

    outs = []
    for sync in (True, False):
        tr = Trainer(model, tx, mesh=mesh, label_smoothing=0.1,
                     print_freq=1000, sync_bn=sync)
        state = tr.create_state(jax.random.PRNGKey(0), img)
        state, metrics = tr._train_step(
            state, jnp.asarray(images), jnp.asarray(labels)
        )
        outs.append((state, metrics))
    (s_sync, m_sync), (s_local, m_local) = outs
    np.testing.assert_allclose(
        float(m_sync["loss"]), float(m_local["loss"]), rtol=1e-3
    )
    assert int(m_sync["count"]) == int(m_local["count"]) == 16

    p0 = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, img, img, 3)), train=False)["params"]

    def flat(tree):
        return np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree.leaves(tree)]
        )

    d_sync = flat(s_sync.params) - flat(p0)
    d_local = flat(s_local.params) - flat(p0)
    rel = np.linalg.norm(d_sync - d_local) / np.linalg.norm(d_sync)
    assert rel < 0.02, f"update vectors diverge: {rel:.4f}"


def test_local_bn_differs_from_sync_on_distinct_shards():
    """--no-sync-bn must change observable behavior: with different data per
    shard, per-device normalization diverges from global-batch
    normalization (this is the real DDP-vs-syncBN difference)."""
    sync_tr, local_tr = _trainers_for_bn_modes(dropout=0.0)
    images, labels = _data(16)
    # Push shard means far apart so the local/global stat gap is macroscopic.
    images = images + np.arange(16, dtype=np.float32)[:, None, None, None]

    losses = []
    for tr in (sync_tr, local_tr):
        state = tr.create_state(jax.random.PRNGKey(0), IMG)
        _, metrics = tr._train_step(
            state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses.append(float(metrics["loss"]))
    assert abs(losses[0] - losses[1]) > 1e-4, losses


def test_multihost_placement_branch(monkeypatch):
    """Unit test: prefetch_to_device must route through
    jax.make_array_from_process_local_data when process_count > 1 — a plain
    device_put would misplace host-local shards (SURVEY.md §2.6). The real
    2-process integration proof is tools/multihost_smoke.py
    (tests/test_multihost.py)."""
    from mnasnet_tpu.data import pipeline as pl
    from mnasnet_tpu.parallel import mesh as pm

    mesh = make_mesh(jax.devices())
    shardings = (batch_sharding(mesh), label_sharding(mesh))
    calls = []

    def fake_make_global(sharding, local):
        calls.append(local.shape)
        return jax.device_put(local, sharding)  # stand-in placement

    monkeypatch.setattr(pm, "_process_count", lambda: 2)
    monkeypatch.setattr(pm, "_make_global_array", fake_make_global)

    batches = iter([(np.zeros((16, IMG, IMG, 3), np.float32),
                     np.zeros((16,), np.int32))])
    out = list(pl.prefetch_to_device(batches, sharding=shardings))
    assert len(out) == 1
    assert calls == [(16, IMG, IMG, 3), (16,)]


def test_dcn_mesh_equivalent_to_flat_data_mesh():
    """Multi-slice stretch ([B:configs[3]]): a (dcn=2, data=4) mesh must
    produce the same step as the flat 8-device data mesh — the batch shards
    over ('dcn','data') jointly and GSPMD's hierarchical reduction is
    numerically a reduction over all 8 shards."""
    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                    precision="highest", bn_stats="two_pass")
    tx = create_optimizer("sgd", 0.1, weight_decay=0.0)
    images, labels = _data(16)

    results = []
    for mesh in (make_mesh(jax.devices()),
                 make_mesh(jax.devices(), dcn=2, data=4)):
        trainer = Trainer(model, tx, mesh=mesh, label_smoothing=0.1,
                          print_freq=1000)
        state = trainer.create_state(jax.random.PRNGKey(0), IMG)
        state, metrics = trainer._train_step(
            state, jnp.asarray(images), jnp.asarray(labels)
        )
        results.append((state, metrics))
    (sf, mf), (sd, md) = results
    np.testing.assert_allclose(float(mf["loss"]), float(md["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(sf.params), jax.tree.leaves(sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_local_bn_rejects_dcn_mesh():
    from mnasnet_tpu.train.steps import make_local_bn_train_step

    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla")
    tx = create_optimizer("sgd", 0.1)
    mesh = make_mesh(jax.devices(), dcn=2, data=4)
    with pytest.raises(ValueError, match="dcn"):
        make_local_bn_train_step(model, tx, 0.1, mesh=mesh)
