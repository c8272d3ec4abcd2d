"""Transfer learning: pretrained backbone + fresh classifier head
(``load_pretrained`` num_classes mismatch), and the ``--freeze-backbone``
linear probe (``optim.freeze``). The torch lineage's canonical fine-tuning
pattern — swap the final Linear after ``load_state_dict``, set
``requires_grad=False`` on the backbone — re-expressed functionally
(SURVEY.md §2.1 "Pretrained load", §2.2 optimizer row)."""

import os
import runpy
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mnasnet_tpu.convert import torch_to_flax
from mnasnet_tpu.pretrained import load_pretrained
from mnasnet_tpu.train.optim import backbone_frozen_mask, create_optimizer
from tests.torch_ref import TorchMNASNet, randomize_bn_stats

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "train.py")


def _save_ckpt(tmp_path, alpha=0.35, num_classes=12):
    torch.manual_seed(0)
    tm = TorchMNASNet(alpha, num_classes=num_classes)
    randomize_bn_stats(tm)
    path = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": tm.state_dict()}, path)
    return tm, path


def _assert_trees_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)),
        a, b,
    )


# ----------------------------------------------------------- library surface
def test_load_pretrained_class_mismatch_reinits_classifier(tmp_path):
    """A 12-class checkpoint into a 5-class model: backbone + BN stats load
    from the checkpoint exactly; the classifier is freshly initialized at
    the right shape and the forward runs end to end."""
    tm, path = _save_ckpt(tmp_path, num_classes=12)
    model, variables = load_pretrained("mnasnet0_35", path, num_classes=5)
    assert variables["params"]["classifier"]["kernel"].shape == (1280, 5)
    assert variables["params"]["classifier"]["bias"].shape == (5,)

    ref = torch_to_flax(tm.state_dict(), 0.35)
    for k, sub in ref["params"].items():
        if k == "classifier":
            continue
        _assert_trees_equal(variables["params"][k], sub)
    _assert_trees_equal(variables["batch_stats"], ref["batch_stats"])

    # fresh init is the model's own (deterministic from the default rng),
    # not zeros and not the checkpoint's
    assert float(np.abs(variables["params"]["classifier"]["kernel"]).max()) > 0

    logits = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert logits.shape == (1, 5)


def test_load_pretrained_matching_classes_untouched(tmp_path):
    """No mismatch → the classifier loads from the checkpoint verbatim
    (regression guard: the transfer path must not trigger spuriously)."""
    tm, path = _save_ckpt(tmp_path, num_classes=12)
    _, variables = load_pretrained("mnasnet0_35", path, num_classes=12)
    ref = torch_to_flax(tm.state_dict(), 0.35)
    _assert_trees_equal(variables["params"]["classifier"],
                        ref["params"]["classifier"])


# --------------------------------------------------------------- freeze math
@pytest.mark.parametrize("fused", [False, "small", True],
                         ids=["per-leaf", "fused-small", "fused-all"])
def test_freeze_zeroes_backbone_updates(fused):
    """Frozen params get EXACTLY zero updates — including the coupled
    weight decay, which is added to the gradient inside the core tx and
    must not leak into 'frozen' kernels (the freeze wraps AFTER the tx).
    Parametrized over the packed-update variants: the mask applies to the
    unpacked tree either way."""
    params = {
        "stem_conv": {"kernel": jnp.full((3, 3, 3, 8), 0.5)},
        "stem_bn": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
        "classifier": {"kernel": jnp.full((8, 4), 0.5),
                       "bias": jnp.zeros((4,))},
    }
    tx = create_optimizer("sgd", 0.1, weight_decay=1e-2, fused=fused,
                          frozen_mask=backbone_frozen_mask)
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(3):  # momentum/wd accumulate over steps; stay zero
        upd, st = tx.update(grads, st, params)
        import optax
        params = optax.apply_updates(params, upd)
    assert float(np.abs(np.asarray(upd["stem_conv"]["kernel"])).max()) == 0.0
    assert float(np.abs(np.asarray(upd["stem_bn"]["scale"])).max()) == 0.0
    assert float(np.abs(np.asarray(upd["classifier"]["kernel"])).max()) > 0.0
    assert float(np.abs(np.asarray(upd["classifier"]["bias"])).max()) > 0.0


def test_freeze_composes_with_model_ema():
    """model_ema wraps outside the freeze: the shadow of a frozen param
    stays AT the param value (it never moves), the head's shadow trails."""
    from mnasnet_tpu.train.optim import get_ema_params

    params = {
        "stem_conv": {"kernel": jnp.full((3, 3, 3, 8), 0.5)},
        "classifier": {"kernel": jnp.full((8, 4), 0.5)},
    }
    tx = create_optimizer("sgd", 0.1, weight_decay=0.0, model_ema=0.5,
                          frozen_mask=backbone_frozen_mask)
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, st = tx.update(grads, st, params)
    import optax
    new_params = optax.apply_updates(params, upd)
    ema = get_ema_params(st)
    np.testing.assert_array_equal(np.asarray(ema["stem_conv"]["kernel"]),
                                  np.asarray(params["stem_conv"]["kernel"]))
    head_ema = np.asarray(ema["classifier"]["kernel"])
    assert not np.array_equal(head_ema,
                              np.asarray(new_params["classifier"]["kernel"]))


# ---------------------------------------------------------------- CLI surface
BASE = [
    "--synthetic", "--arch", "mnasnet0_35", "--num-classes", "5",
    "--image-size", "32", "--batch-size", "16", "--synthetic-size", "32",
    "--workers", "0", "--print-freq", "100", "--dtype", "float32",
    "--seed", "0",
]


def _run(argv):
    old = sys.argv
    sys.argv = ["train.py", *argv]
    try:
        runpy.run_path(TRAIN, run_name="__main__")
    finally:
        sys.argv = old


def test_cli_pretrained_npz(tmp_path, capfd):
    """--pretrained accepts converted .npz weight archives (torch-keyed
    arrays) through the same unified loader as .pth — the torch-free
    deployment path."""
    tm, _ = _save_ckpt(tmp_path, num_classes=5)
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **{k: v.numpy() for k, v in tm.state_dict().items()})
    out = str(tmp_path / "out_npz")
    _run([*BASE, "--epochs", "1", "--output-dir", out, "--pretrained", npz])
    text = capfd.readouterr().out
    assert "loaded pretrained weights" in text


def test_cli_transfer_learning_linear_probe(tmp_path, capfd):
    """train.py --pretrained <12-class ckpt> --num-classes 5
    --freeze-backbone: the transfer-learning load message prints, the run
    completes, and the final checkpoint's backbone params equal the
    converted checkpoint backbone exactly (only the head trained; BN
    running stats are allowed to move)."""
    from mnasnet_tpu.train.checkpoint import CheckpointManager

    tm, path = _save_ckpt(tmp_path, num_classes=12)
    out = str(tmp_path / "out")
    _run([*BASE, "--epochs", "1", "--output-dir", out,
          "--pretrained", path, "--freeze-backbone"])
    out_text = capfd.readouterr().out
    assert "transfer-learning load" in out_text
    assert "--freeze-backbone: only the classifier head trains" in out_text

    mgr = CheckpointManager(out)
    vars_, epoch, _ = mgr.restore_variables()
    mgr.close()
    assert epoch == 0

    ref = torch_to_flax(tm.state_dict(), 0.35)
    for k, sub in ref["params"].items():
        if k == "classifier":
            continue
        _assert_trees_equal(vars_["params"][k], sub)
    # the head DID train: the classifier bias initializes to exactly zero,
    # so any nonzero value proves updates reached it
    assert float(np.abs(np.asarray(
        vars_["params"]["classifier"]["bias"])).max()) > 0.0
    # BN running stats updated (training mode, torch semantics)
    stem_mean_ckpt = np.asarray(ref["batch_stats"]["stem_bn"]["mean"])
    stem_mean_final = np.asarray(vars_["batch_stats"]["stem_bn"]["mean"])
    assert not np.array_equal(stem_mean_ckpt, stem_mean_final)
