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
