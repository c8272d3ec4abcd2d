"""Integration: train-step smoke (loss decreases), checkpoint round-trip with
bitwise-identical continuation (SURVEY.md §4.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnasnet_tpu import MNASNet
from mnasnet_tpu.data.dataset import SyntheticDataset
from mnasnet_tpu.data.pipeline import DataLoader
from mnasnet_tpu.data.transforms import train_transform
from mnasnet_tpu.parallel.mesh import make_mesh
from mnasnet_tpu.train.optim import create_optimizer
from mnasnet_tpu.train.trainer import Trainer


IMG = 32


@pytest.fixture(scope="module")
def tiny_setup():
    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla")
    tx = create_optimizer("sgd", 0.05, weight_decay=1e-5)
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(model, tx, mesh=mesh, label_smoothing=0.1,
                      print_freq=1000)
    ds = SyntheticDataset(length=64, image_size=IMG, num_classes=8, seed=0)
    loader = DataLoader(
        ds, 16, lambda img, rng: train_transform(img, IMG, rng),
        shuffle=True, drop_last=True, seed=0, workers=0,
    )
    return model, tx, trainer, loader


def test_loss_decreases(tiny_setup):
    model, tx, trainer, loader = tiny_setup
    state = trainer.create_state(jax.random.PRNGKey(0), IMG)
    losses = []
    for epoch in range(6):
        for images, labels in loader.epoch(epoch):
            state, metrics = trainer._train_step(
                state, jnp.asarray(images), jnp.asarray(labels)
            )
            losses.append(float(metrics["loss"]))
    assert int(state.step) == len(losses)
    # Synthetic labels are random noise, but per-epoch content repeats —
    # the model should memorize: late-loss well below early-loss.
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) - 0.1, losses


def test_checkpoint_roundtrip_bitwise(tiny_setup, tmp_path):
    from mnasnet_tpu.train.checkpoint import CheckpointManager

    model, tx, trainer, loader = tiny_setup
    state = trainer.create_state(jax.random.PRNGKey(1), IMG)
    batches = list(loader.epoch(0))
    for images, labels in batches[:2]:
        state, _ = trainer._train_step(state, jnp.asarray(images), jnp.asarray(labels))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(epoch=0, state=state, acc1=12.5, best_acc1=12.5, wait=True)

    template = trainer.create_state(jax.random.PRNGKey(2), IMG)
    restored, start_epoch, best = mgr.restore(template)
    assert start_epoch == 1 and best == 12.5

    # Continuation must be bitwise identical given the same data order.
    images, labels = batches[2]
    s1, m1 = trainer._train_step(state, jnp.asarray(images), jnp.asarray(labels))
    s2, m2 = trainer._train_step(restored, jnp.asarray(images), jnp.asarray(labels))
    assert float(m1["loss"]) == float(m2["loss"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s1.params, s2.params,
    )
    mgr.close()


def test_checkpoint_keeps_latest_and_best(tiny_setup, tmp_path):
    """Retention policy (ADVICE r1): the main manager keeps the LATEST N so
    resume never rolls back to an old high-watermark; the best checkpoint is
    tracked separately (the reference's model_best)."""
    from mnasnet_tpu.train.checkpoint import CheckpointManager

    model, tx, trainer, loader = tiny_setup
    state = trainer.create_state(jax.random.PRNGKey(4), IMG)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    accs = [10.0, 30.0, 20.0, 15.0, 5.0]  # acc declines after epoch 1
    best = 0.0
    for epoch, acc in enumerate(accs):
        is_best = acc > best
        best = max(best, acc)
        mgr.save(epoch, state, acc, best, wait=True, is_best=is_best)

    assert mgr.latest_epoch() == 4, "resume must use the newest checkpoint"
    assert mgr.best_epoch() == 1, "model_best must be the acc1 argmax"

    template = trainer.create_state(jax.random.PRNGKey(5), IMG)
    _, start_epoch, best_acc1 = mgr.restore(template)
    assert start_epoch == 5 and best_acc1 == 30.0
    _, best_start, _ = mgr.restore(template, best=True)
    assert best_start == 2
    mgr.close()


def test_eval_step_uses_running_stats(tiny_setup):
    model, tx, trainer, loader = tiny_setup
    state = trainer.create_state(jax.random.PRNGKey(3), IMG)
    images, labels = next(iter(loader.epoch(0)))
    m1 = trainer._eval_step(state.params, state.batch_stats,
                            jnp.asarray(images), jnp.asarray(labels))
    m2 = trainer._eval_step(state.params, state.batch_stats,
                            jnp.asarray(images), jnp.asarray(labels))
    assert float(m1["loss"]) == float(m2["loss"])  # deterministic, no dropout
    assert int(m1["count"]) == 16


def test_restore_variables_without_optimizer_template(tmp_path):
    """eval.py --resume reads weights via a template-free raw restore —
    must work for ANY optimizer/fused-state layout the run used (an
    sgd-shaped template cannot restore an rmsprop+fused checkpoint)."""
    from mnasnet_tpu.train.checkpoint import CheckpointManager
    from mnasnet_tpu.train.state import TrainState

    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                    bn_ema="external")
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, IMG, IMG, 3)), train=False)
    tx = create_optimizer("rmsprop", 0.05, fused="small")
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, jax.random.PRNGKey(7))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, acc1=12.5, best_acc1=12.5, is_best=True, wait=True)

    got, epoch, best = mgr.restore_variables()
    assert epoch == 0 and best == 12.5
    for a, b in zip(jax.tree.leaves(got["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    got_best, _, _ = mgr.restore_variables(best=True)
    for a, b in zip(jax.tree.leaves(got_best["batch_stats"]),
                    jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


# ---------------------------------------------------------------- grad accum
def _accum_fixture():
    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                    precision="highest", bn_ema="external")
    tx = create_optimizer("sgd", 0.1, weight_decay=1e-5)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 8, 16).astype(np.int32))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
    return model, tx, images, labels, variables


def test_grad_accum_equals_local_bn_dp():
    """Sequential gradient accumulation (grad_accum=k, one device) must
    reproduce parallel local-BN data-parallelism (k replicas) — same
    per-microbatch BN statistics, count-weighted grad combine, and
    per-microbatch dropout folds (steps.py contract)."""
    from mnasnet_tpu.parallel.mesh import (
        batch_sharding, label_sharding, replicated, replicate_state,
    )
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import (
        make_local_bn_train_step, make_train_step,
    )

    k = 4
    model, tx, images, labels, variables = _accum_fixture()

    def fresh_state():
        return TrainState.create(
            variables["params"], variables["batch_stats"], tx,
            jax.random.PRNGKey(3),
        )

    accum_step = jax.jit(make_train_step(model, tx, 0.1, grad_accum=k))
    s_a, m_a = accum_step(fresh_state(), images, labels)

    mesh = make_mesh(jax.devices()[:k])
    local_step = jax.jit(
        make_local_bn_train_step(model, tx, 0.1, mesh=mesh),
        in_shardings=(replicated(mesh), batch_sharding(mesh),
                      label_sharding(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    s_b, m_b = local_step(replicate_state(mesh, fresh_state()),
                          images, labels)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    assert int(m_a["top1"]) == int(m_b["top1"])
    assert int(m_a["count"]) == int(m_b["count"]) == 16

    def flat(tree):
        return np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree.leaves(tree)])

    p_a, p_b = flat(s_a.params), flat(s_b.params)
    p_0 = flat(variables["params"])
    rel = (np.linalg.norm(p_a - p_b)
           / max(np.linalg.norm(p_a - p_0), 1e-12))
    assert rel < 1e-3, f"update vectors diverge: {rel:.2e}"
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        s_a.batch_stats, s_b.batch_stats,
    )


def test_grad_accum_validation():
    from mnasnet_tpu.train.steps import make_train_step

    model, tx, images, labels, variables = _accum_fixture()
    # module-EMA model: accumulation would EMA once per microbatch
    module_model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla")
    with pytest.raises(ValueError, match="bn_ema"):
        make_train_step(module_model, tx, 0.1, grad_accum=2)
    with pytest.raises(ValueError, match="grad_accum"):
        make_train_step(model, tx, 0.1, grad_accum=0)
    # batch not divisible by k: trace-time error
    from mnasnet_tpu.train.state import TrainState
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx,
        jax.random.PRNGKey(3),
    )
    step = make_train_step(model, tx, 0.1, grad_accum=3)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(step)(state, images, labels)


def test_grad_accum_trainer_cli_guards():
    model, tx, *_ = _accum_fixture()
    with pytest.raises(ValueError, match="sync"):
        Trainer(model, tx, mesh=make_mesh(jax.devices()[:1]),
                sync_bn=False, grad_accum=2)


def test_grad_accum_on_sharded_mesh():
    """grad_accum composes with GSPMD data sharding: the in-step reshape
    (B,) -> (k, B/k) forces a reshard, which XLA must insert; the step
    must still run and produce finite, consistent metrics."""
    model, tx, images, labels, variables = _accum_fixture()
    trainer = Trainer(model, tx, mesh=make_mesh(jax.devices()[:2]),
                      label_smoothing=0.1, grad_accum=2, print_freq=1000)
    state = trainer.create_state(jax.random.PRNGKey(0), IMG)
    state, metrics = trainer._train_step(state, images, labels)
    assert int(metrics["count"]) == 16
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_grad_accum_reduces_temp_memory():
    """The memory claim behind --grad-accum, pinned compile-only: XLA's own
    buffer assignment must allocate less temp space (live intermediates,
    incl. saved activations) for the accumulated step at the same global
    batch (tools/memory_probe.py is the production-shape instrument)."""
    model, tx, _, _, variables = _accum_fixture()
    from mnasnet_tpu.train.state import TrainState
    from mnasnet_tpu.train.steps import make_train_step

    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx,
        jax.random.PRNGKey(0),
    )
    images = jax.ShapeDtypeStruct((16, IMG, IMG, 3), jnp.float32)
    labels = jax.ShapeDtypeStruct((16,), jnp.int32)

    def temp_bytes(k):
        step = make_train_step(model, tx, 0.1, grad_accum=k)
        compiled = (
            jax.jit(step, donate_argnums=(0,))
            .lower(state, images, labels).compile()
        )
        return compiled.memory_analysis().temp_size_in_bytes

    t1, t4 = temp_bytes(1), temp_bytes(4)
    assert t4 < 0.8 * t1, f"accum=4 temp {t4} not < 80% of accum=1 temp {t1}"


def test_checkpoint_restore_ema_variables(tmp_path):
    """--model-ema end-to-end through orbax: the shadow params ride the
    optimizer state, and restore_variables(use_ema=True) recovers them
    template-free (eval.py --use-ema path)."""
    from mnasnet_tpu.train.checkpoint import CheckpointManager
    from mnasnet_tpu.train.optim import get_ema_params

    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                    bn_ema="external")
    tx = create_optimizer("rmsprop", 0.05, fused="small", model_ema=0.9)
    trainer = Trainer(model, tx, mesh=make_mesh(jax.devices()[:1]),
                      print_freq=1000)
    state = trainer.create_state(jax.random.PRNGKey(0), IMG)
    rng = np.random.default_rng(0)
    for _ in range(2):
        images = jnp.asarray(
            rng.standard_normal((8, IMG, IMG, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 8, 8).astype(np.int32))
        state, _ = trainer._train_step(state, images, labels)

    live_ema = get_ema_params(state.opt_state)
    assert live_ema is not None
    # after 2 warmed-up EMA updates the shadow must differ from raw params
    assert not np.allclose(
        np.asarray(jax.tree.leaves(live_ema)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(epoch=0, state=state, acc1=1.0, best_acc1=1.0, wait=True)
    variables, _, _ = mgr.restore_variables(use_ema=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        variables["params"], live_ema,
    )
    raw, _, _ = mgr.restore_variables()
    assert not np.allclose(
        np.asarray(jax.tree.leaves(raw["params"])[0]),
        np.asarray(jax.tree.leaves(variables["params"])[0]))
    mgr.close()

    # a run without --model-ema: use_ema must fail loudly
    tx2 = create_optimizer("sgd", 0.05)
    trainer2 = Trainer(model, tx2, mesh=make_mesh(jax.devices()[:1]),
                       print_freq=1000)
    state2 = trainer2.create_state(jax.random.PRNGKey(0), IMG)
    mgr2 = CheckpointManager(str(tmp_path / "ckpt2"))
    mgr2.save(epoch=0, state=state2, acc1=1.0, best_acc1=1.0, wait=True)
    with pytest.raises(ValueError, match="model-EMA"):
        mgr2.restore_variables(use_ema=True)
    mgr2.close()
