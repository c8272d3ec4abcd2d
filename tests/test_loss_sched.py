"""Loss parity vs torch CE(label_smoothing) + schedule shapes."""

import jax.numpy as jnp
import numpy as np
import torch

from mnasnet_tpu.train.loss import cross_entropy, topk_correct
from mnasnet_tpu.train.schedules import make_schedule, scale_lr_for_batch


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8).astype(np.int64)
    for eps in (0.0, 0.1):
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), eps))
        ref = float(
            torch.nn.CrossEntropyLoss(label_smoothing=eps)(
                torch.from_numpy(logits), torch.from_numpy(labels)
            )
        )
        assert abs(ours - ref) < 1e-5, (eps, ours, ref)


def test_cross_entropy_masks_padding():
    logits = np.zeros((4, 5), np.float32)
    logits[:, 0] = 5.0
    labels = np.array([0, 0, -1, -1], np.int32)
    masked = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    full = float(cross_entropy(jnp.asarray(logits[:2]), jnp.asarray(labels[:2])))
    assert abs(masked - full) < 1e-6


def test_topk_counts():
    logits = jnp.asarray(
        [[5.0, 1.0, 0.0, 0.0, 0.0, 0.0],
         [0.0, 5.0, 4.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.0, 0.0, 5.0]]
    )
    labels = jnp.asarray([0, 2, -1])
    m = topk_correct(logits, labels)
    assert int(m["top1"]) == 1  # only row 0 correct@1; row 2 masked
    assert int(m["top5"]) == 2  # rows 0,1 correct@5
    assert int(m["count"]) == 2


def test_step_schedule_divides_by_10_every_30_epochs():
    spe = 100
    s = make_schedule("step", 0.5, spe, 90)
    assert float(s(0)) == 0.5
    np.testing.assert_allclose(float(s(30 * spe)), 0.05, rtol=1e-5)
    np.testing.assert_allclose(float(s(60 * spe)), 0.005, rtol=1e-5)


def test_warmup_then_cosine():
    spe = 10
    s = make_schedule("cosine", 1.0, spe, 10, warmup_epochs=2.0)
    assert float(s(0)) == 0.0
    assert abs(float(s(20)) - 1.0) < 1e-6  # end of warmup
    assert float(s(99)) < 0.1  # decayed near the end


def test_exp_schedule():
    spe = 10
    s = make_schedule("exp", 1.0, spe, 100, exp_decay_factor=0.97,
                      exp_decay_epochs=2.4)
    assert abs(float(s(int(2.4 * spe))) - 0.97) < 1e-6


def test_linear_lr_scaling():
    assert scale_lr_for_batch(0.1, 1024) == 0.4
