"""Elastic recovery across device counts (SURVEY.md §5.3, §5.4).

The reference's recovery story assumes the job comes back with the SAME
world size (a torch .pth.tar is topology-blind, but the DDP launcher is
not). Here the orbax checkpoint stores global arrays; restoring into a
TrainState template built for a DIFFERENT mesh makes orbax reshard onto the
new topology — so a job checkpointed on 8 chips can continue on 4 (or 1)
after a partial outage. This test proves the capability: one step after
restore, every topology produces the same parameter update to fp32
reduction-order precision.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mnasnet_tpu import MNASNet
from mnasnet_tpu.parallel.mesh import make_mesh
from mnasnet_tpu.train.checkpoint import CheckpointManager
from mnasnet_tpu.train.optim import create_optimizer
from mnasnet_tpu.train.trainer import Trainer

IMG = 32


def _trainer(ndev: int) -> Trainer:
    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                    precision="highest", bn_stats="two_pass")
    tx = create_optimizer("sgd", 0.05, weight_decay=1e-5)
    return Trainer(model, tx, mesh=make_mesh(jax.devices()[:ndev]),
                   label_smoothing=0.1, print_freq=1000)


def _flat(tree) -> np.ndarray:
    return np.concatenate(
        [np.ravel(np.asarray(x)) for x in jax.tree.leaves(tree)]
    )


def test_checkpoint_restores_across_device_counts(tmp_path):
    rng = np.random.default_rng(0)

    def batch():
        return (
            jnp.asarray(rng.standard_normal((16, IMG, IMG, 3),
                                            dtype=np.float32)),
            jnp.asarray(rng.integers(0, 8, (16,))),
        )

    warm, nxt = batch(), batch()

    # Warm one step on the full 8-device mesh and checkpoint.
    tr8 = _trainer(8)
    state = tr8.create_state(jax.random.PRNGKey(0), IMG)
    state, _ = tr8._train_step(state, *warm)
    ckpt = _flat(state.params)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, state, 0.0, 0.0, wait=True)
    mgr.close()

    # Oracle: the 8-device continuation (donation invalidates `state` here,
    # which is why the checkpoint is written first).
    s8, m8 = tr8._train_step(state, *nxt)
    ref_update = _flat(s8.params) - ckpt
    ref_stats = s8.batch_stats

    for ndev in (4, 1):
        tr = _trainer(ndev)
        # A differently-seeded template proves restore overwrites every leaf.
        template = tr.create_state(jax.random.PRNGKey(1), IMG)
        restored, epoch, _ = CheckpointManager(str(tmp_path)).restore(
            template
        )
        assert epoch == 1
        np.testing.assert_array_equal(_flat(restored.params), ckpt)
        # The restored arrays must live on the NEW mesh's devices — orbax
        # resharded, no stale 8-device placement survives.
        placed = {
            d
            for leaf in jax.tree.leaves(restored.params)
            for d in leaf.devices()
        }
        assert placed <= set(jax.devices()[:ndev]), (ndev, placed)

        s, m = tr._train_step(restored, *nxt)
        np.testing.assert_allclose(
            float(m["loss"]), float(m8["loss"]), rtol=1e-4
        )
        # Same start point + same global batch ⇒ only the gradient
        # all-reduce decomposition differs across meshes: the update
        # vectors agree to reduction-order noise (same invariant family as
        # tests/test_parallel.py's DDP-equivalence, but tighter because
        # both trajectories share the restored params bitwise).
        update = _flat(s.params) - ckpt
        rel = (np.linalg.norm(update - ref_update)
               / np.linalg.norm(ref_update))
        assert rel < 0.02, f"{ndev}-device update diverges: rel={rel:.2e}"
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            ref_stats, s.batch_stats,
        )
