"""Preemption-safe training (SURVEY.md §5.3 — recovery beyond the
reference's epoch-only resume): SIGTERM → finish the in-flight step →
collective checkpoint → clean exit; --resume continues at the exact step,
bitwise-identical to an uninterrupted run (the loader skips the consumed
batches without decoding them)."""

import json
import os
import runpy
import signal
import sys
import time

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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "train.py")
IMG = 32


def _loader(length=64, drop_last=True, workers=0):
    ds = SyntheticDataset(length=length, image_size=IMG, num_classes=8, seed=0)
    return DataLoader(
        ds, 16, lambda img, rng: train_transform(img, IMG, rng),
        shuffle=True, drop_last=drop_last, seed=0, workers=workers,
    )


# ------------------------------------------------------------------- loader
def test_loader_start_step_skips_exactly():
    """epoch(e, start_step=k) must yield precisely batches k.. of the same
    (seed, epoch)-keyed order — including the padded-tail masking when the
    skip lands inside the tail."""
    for workers in (0, 2):
        loader = _loader(workers=workers)
        full = list(loader.epoch(3))
        skipped = list(loader.epoch(3, start_step=2))
        assert len(skipped) == len(full) - 2
        for (ai, al), (bi, bl) in zip(full[2:], skipped):
            np.testing.assert_array_equal(ai, bi)
            np.testing.assert_array_equal(al, bl)

    # padded tail: 40 samples / bs16, no drop_last -> 3 batches, tail has
    # 8 valid + 8 label=-1 padding; skipping to the tail keeps the mask
    tail_loader = _loader(length=40, drop_last=False)
    full = list(tail_loader.epoch(1))
    assert len(full) == 3 and (full[-1][1] == -1).sum() == 8
    only_tail = list(tail_loader.epoch(1, start_step=2))
    assert len(only_tail) == 1
    np.testing.assert_array_equal(only_tail[0][0], full[-1][0])
    np.testing.assert_array_equal(only_tail[0][1], full[-1][1])

    # boundary values: start at the end -> empty; past the end -> error
    assert list(tail_loader.epoch(1, start_step=3)) == []
    with pytest.raises(ValueError, match="out of range"):
        list(tail_loader.epoch(1, start_step=4))


# ------------------------------------------------------------------ trainer
def _fresh():
    model = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla")
    tx = create_optimizer("sgd", 0.05, weight_decay=1e-5)
    trainer = Trainer(model, tx, mesh=make_mesh(jax.devices()[:1]),
                      label_smoothing=0.1, print_freq=1000)
    return trainer, _loader()


def test_request_stop_then_resume_bitwise():
    """Interrupted-after-2-steps + resumed-with-start_step ≡ uninterrupted,
    bitwise on every state leaf (params, batch_stats, opt_state, rng, step):
    the stop happens at a batch boundary, the loader skip is exact, and the
    per-step RNG folds key off state.step."""
    trainer_a, loader_a = _fresh()
    state_a = trainer_a.create_state(jax.random.PRNGKey(0), IMG)
    for ep in range(2):
        state_a = trainer_a.train_epoch(state_a, loader_a, ep)
    assert not trainer_a.stopped_early

    trainer_b, loader_b = _fresh()
    state_b = trainer_b.create_state(jax.random.PRNGKey(0), IMG)
    state_b = trainer_b.train_epoch(
        state_b, loader_b, 0,
        step_callback=lambda s, g: trainer_b.request_stop(),
        step_callback_freq=2,
    )
    assert trainer_b.stopped_early
    assert trainer_b.next_global_step == 2
    assert int(state_b.step) == 2

    # sticky flag: a further epoch refuses to run any step, and must NOT
    # clobber next_global_step (first stop wins — recomputing it from the
    # later epoch would silently skip the unconsumed batches on resume)
    state_probe = trainer_b.train_epoch(state_b, loader_b, 1)
    assert trainer_b.stopped_early and int(state_probe.step) == 2
    assert trainer_b.next_global_step == 2

    # resume in a FRESH trainer (new jit), continuing from the stopped state
    trainer_c, loader_c = _fresh()
    spe = loader_c.steps_per_epoch()
    e0, s0 = divmod(trainer_b.next_global_step, spe)
    state_c = trainer_c.train_epoch(state_b, loader_c, e0, start_step=s0)
    state_c = trainer_c.train_epoch(state_c, loader_c, 1)

    flat_a = jax.tree.leaves(
        {"p": state_a.params, "b": state_a.batch_stats,
         "o": state_a.opt_state, "r": state_a.rng, "s": state_a.step})
    flat_c = jax.tree.leaves(
        {"p": state_c.params, "b": state_c.batch_stats,
         "o": state_c.opt_state, "r": state_c.rng, "s": state_c.step})
    assert len(flat_a) == len(flat_c)
    for a, c in zip(flat_a, flat_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


# ---------------------------------------------------------------------- CLI
BASE = [
    "--synthetic", "--arch", "mnasnet0_35", "--num-classes", "8",
    "--image-size", "32", "--batch-size", "16", "--synthetic-size", "48",
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


def _drain_pending_sigterm():
    """Discard any SIGTERM still in flight from the interrupted run.

    These tests run train.py twice in ONE process (runpy), which production
    never does — there each run is its own process and a signal cannot
    outlive it. Under heavy suite contention the SIGTERM os.kill()ed inside
    run 1 can still be pending (kernel-level, or tripped at the interpreter
    level but not yet dispatched) when run 2 starts; it would then fire
    run 2's freshly installed handler and spuriously preempt the resume
    (observed once: the ema parametrization's resume stopping at its
    epoch-0 boundary). SIG_IGN drops kernel-pending instances, and
    executing a few bytecodes under the ignore disposition consumes an
    interpreter-level trip."""
    prev = signal.signal(signal.SIGTERM, signal.SIG_IGN)
    for _ in range(64):
        pass
    time.sleep(0.01)
    signal.signal(signal.SIGTERM, prev)


@pytest.mark.parametrize(
    "extra",
    [[], ["--grad-accum", "2"], ["--model-ema", "0.999"]],
    ids=["plain", "accum2", "ema"],
)
def test_cli_sigterm_preempt_save_resume_bitwise(tmp_path, capfd,
                                                 monkeypatch, extra):
    """Through the real argv + SIGTERM-handler path: deliver SIGTERM after
    step 2 of epoch 0 (via a step_callback that os.kill()s ourselves — the
    handler train.py installs must run), assert the preemption checkpoint
    is written and the process path exits cleanly; then --resume and check
    the final epoch-1 weights are bitwise-identical to an uninterrupted
    run's. Parametrized over the stateful-optimizer compositions: the
    scanned grad-accum microbatch counter and the model-EMA shadow both
    live in opt_state and must ride the preempt checkpoint exactly."""
    from mnasnet_tpu.train.checkpoint import CheckpointManager

    BASE = [*globals()["BASE"], *extra]

    out_ref = str(tmp_path / "ref")
    out_pre = str(tmp_path / "pre")

    # uninterrupted oracle: 2 epochs
    _run([*BASE, "--epochs", "2", "--output-dir", out_ref])
    capfd.readouterr()

    # interrupted: SIGTERM lands after 2 steps of epoch 0 (spe=3)
    orig = Trainer.train_epoch

    def fire_sigterm(state, gstep):
        os.kill(os.getpid(), signal.SIGTERM)

    def wrapped(self, state, loader, epoch, step_callback=None,
                step_callback_freq=0, start_step=0):
        return orig(self, state, loader, epoch, step_callback=fire_sigterm,
                    step_callback_freq=2, start_step=start_step)

    monkeypatch.setattr(Trainer, "train_epoch", wrapped)
    old_handler = signal.getsignal(signal.SIGTERM)
    try:
        _run([*BASE, "--epochs", "2", "--output-dir", out_pre])
    finally:
        monkeypatch.undo()
        signal.signal(signal.SIGTERM, old_handler)
    _drain_pending_sigterm()
    cap = capfd.readouterr()
    # the handler writes via os.write(2, ...) — signal-safe, fd-level
    assert "SIGTERM: finishing the in-flight step" in cap.err
    out = cap.out
    assert "preempted at global step 2" in out
    assert os.path.isdir(os.path.join(out_pre, "preempt"))
    assert os.path.exists(
        os.path.join(out_pre, "preempt", "meta.json")
    )
    assert "epoch 0:" not in out  # no epoch completed before preemption

    # resume: must re-enter mid-epoch and finish both epochs
    try:
        _run([*BASE, "--epochs", "2", "--output-dir", out_pre,
              "--resume", out_pre])
    finally:
        signal.signal(signal.SIGTERM, old_handler)
    out = capfd.readouterr().out
    assert "resumed from preemption checkpoint: epoch 0 step 2" in out
    assert "epoch 0:" in out and "epoch 1:" in out

    ref_mgr = CheckpointManager(out_ref)
    pre_mgr = CheckpointManager(out_pre)
    ref_vars, ref_epoch, _ = ref_mgr.restore_variables()
    pre_vars, pre_epoch, _ = pre_mgr.restore_variables()
    ref_mgr.close()
    pre_mgr.close()
    assert ref_epoch == pre_epoch == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref_vars, pre_vars,
    )


def test_cli_sigterm_at_epoch_boundary_saves_epoch_checkpoint(
        tmp_path, capfd, monkeypatch):
    """SIGTERM landing during the LAST batch of an epoch (stop registers at
    the boundary, for-else path): every batch ran, so train.py must write
    the normal epoch checkpoint — not a preempt/ entry — or eval/--resume
    would silently serve weights one epoch stale; resume then runs only the
    remaining epochs, bitwise-identical to uninterrupted."""
    from mnasnet_tpu.train.checkpoint import CheckpointManager

    out_ref = str(tmp_path / "ref")
    out_pre = str(tmp_path / "pre")

    _run([*BASE, "--epochs", "2", "--output-dir", out_ref])
    capfd.readouterr()

    orig = Trainer.train_epoch

    def fire_sigterm(state, gstep):
        os.kill(os.getpid(), signal.SIGTERM)

    def wrapped(self, state, loader, epoch, step_callback=None,
                step_callback_freq=0, start_step=0):
        # spe=3: freq 3 fires after the epoch's last step; the flag is
        # then seen by the exhausted-iterator (for-else) path.
        return orig(self, state, loader, epoch, step_callback=fire_sigterm,
                    step_callback_freq=3, start_step=start_step)

    monkeypatch.setattr(Trainer, "train_epoch", wrapped)
    old_handler = signal.getsignal(signal.SIGTERM)
    try:
        _run([*BASE, "--epochs", "2", "--output-dir", out_pre])
    finally:
        monkeypatch.undo()
        signal.signal(signal.SIGTERM, old_handler)
    _drain_pending_sigterm()
    out = capfd.readouterr().out
    assert "preempted at the epoch-0 boundary" in out
    assert not os.path.isdir(os.path.join(out_pre, "preempt"))

    try:
        _run([*BASE, "--epochs", "2", "--output-dir", out_pre,
              "--resume", out_pre])
    finally:
        signal.signal(signal.SIGTERM, old_handler)
    out = capfd.readouterr().out
    assert "resumed from epoch 0" in out
    assert "epoch 1:" in out and "epoch 0:" not in out

    ref_mgr = CheckpointManager(out_ref)
    pre_mgr = CheckpointManager(out_pre)
    ref_vars, ref_epoch, _ = ref_mgr.restore_variables()
    pre_vars, pre_epoch, _ = pre_mgr.restore_variables()
    ref_mgr.close()
    pre_mgr.close()
    assert ref_epoch == pre_epoch == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref_vars, pre_vars,
    )


def test_resume_refuses_missing_checkpoint(tmp_path):
    """A mistyped --resume path must abort, not silently train from
    scratch (discarding the run it was meant to continue)."""
    with pytest.raises(SystemExit, match="no checkpoint found"):
        _run([*BASE, "--epochs", "1",
              "--output-dir", str(tmp_path / "out"),
              "--resume", str(tmp_path / "nonexistent")])


def _with_batch_size(argv, bs):
    argv = list(argv)
    argv[argv.index("--batch-size") + 1] = str(bs)
    return argv


def test_resume_refuses_steps_per_epoch_mismatch(tmp_path, capfd,
                                                 monkeypatch):
    """The preempt key is in global-step units: resuming with a different
    batch size/dataset would mis-map divmod(gstep, spe) — refused via the
    pinned meta.json. But ONLY when the preempt checkpoint is actually
    consumed: once the interruption has been resumed and superseded by an
    epoch checkpoint, the stale preempt entry must not block a legal
    epoch-granular resume with a new batch size."""
    out = str(tmp_path / "run")

    # real preemption: SIGTERM lands after step 2 of epoch 0 (spe=3)
    orig = Trainer.train_epoch

    def fire_sigterm(state, gstep):
        os.kill(os.getpid(), signal.SIGTERM)

    def wrapped(self, state, loader, epoch, step_callback=None,
                step_callback_freq=0, start_step=0):
        return orig(self, state, loader, epoch, step_callback=fire_sigterm,
                    step_callback_freq=2, start_step=start_step)

    monkeypatch.setattr(Trainer, "train_epoch", wrapped)
    old_handler = signal.getsignal(signal.SIGTERM)
    try:
        _run([*BASE, "--epochs", "2", "--output-dir", out])
    finally:
        monkeypatch.undo()
        signal.signal(signal.SIGTERM, old_handler)
    _drain_pending_sigterm()
    capfd.readouterr()
    assert os.path.exists(os.path.join(out, "preempt", "meta.json"))

    # mid-epoch resume with a different batch size (spe 3 -> 6): refused
    with pytest.raises(SystemExit, match="steps_per_epoch"):
        _run([*_with_batch_size(BASE, 8), "--epochs", "2",
              "--output-dir", out, "--resume", out])
    capfd.readouterr()

    # correct resume consumes the preempt checkpoint and finishes the run
    _run([*BASE, "--epochs", "2", "--output-dir", out, "--resume", out])
    out_text = capfd.readouterr().out
    assert "resumed from preemption checkpoint: epoch 0 step 2" in out_text

    # the preempt entry (key 2) is now STALE; an epoch-granular resume with
    # a new batch size is legal and must not be blocked by its meta.json
    _run([*_with_batch_size(BASE, 8), "--epochs", "3",
          "--output-dir", out, "--resume", out])
    out_text = capfd.readouterr().out
    assert "epoch 2:" in out_text


def _train_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location("train_mod", TRAIN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_check_preempt_meta_tolerates_torn_or_missing(tmp_path, capsys):
    """A hard kill can tear the meta.json write; the resume must warn and
    proceed (the checkpoint itself is orbax-atomic), not crash."""
    train_mod = _train_module()
    pre = tmp_path / "preempt"
    pre.mkdir()
    train_mod._check_preempt_meta(str(pre), 3)  # missing: fine
    (pre / "meta.json").write_text("{truncated")
    train_mod._check_preempt_meta(str(pre), 3)  # torn: warn, fine
    (pre / "meta.json").write_text('{"steps_per_epoch": 3}')
    train_mod._check_preempt_meta(str(pre), 3)  # matching: fine
    (pre / "meta.json").write_text(
        '{"steps_per_epoch": 7, "global_batch": 8}'
    )
    with pytest.raises(SystemExit, match="steps_per_epoch=7"):
        train_mod._check_preempt_meta(str(pre), 3)


def test_cli_preempt_before_first_step_resumes(tmp_path, capfd,
                                               monkeypatch):
    """A preemption landing before the very first optimizer step writes
    preempt key 0 — --resume must restore it (regression: `gstep > 0*spe`
    refused key 0 as 'no checkpoint found', bricking supervised
    restarts)."""
    from mnasnet_tpu.train.checkpoint import CheckpointManager

    out_ref = str(tmp_path / "ref")
    out_pre = str(tmp_path / "pre")

    _run([*BASE, "--epochs", "2", "--output-dir", out_ref])
    capfd.readouterr()

    orig = Trainer.train_epoch

    def wrapped(self, state, loader, epoch, step_callback=None,
                step_callback_freq=0, start_step=0):
        self.request_stop()  # stop flag set BEFORE any step issues
        return orig(self, state, loader, epoch, start_step=start_step)

    monkeypatch.setattr(Trainer, "train_epoch", wrapped)
    try:
        _run([*BASE, "--epochs", "2", "--output-dir", out_pre])
    finally:
        monkeypatch.undo()
    out = capfd.readouterr().out
    assert "preempted at global step 0" in out

    _run([*BASE, "--epochs", "2", "--output-dir", out_pre,
          "--resume", out_pre])
    out = capfd.readouterr().out
    assert "resumed from preemption checkpoint: epoch 0 step 0" in out

    ref_mgr = CheckpointManager(out_ref)
    pre_mgr = CheckpointManager(out_pre)
    ref_vars, ref_epoch, _ = ref_mgr.restore_variables()
    pre_vars, pre_epoch, _ = pre_mgr.restore_variables()
    ref_mgr.close()
    pre_mgr.close()
    assert ref_epoch == pre_epoch == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref_vars, pre_vars,
    )
