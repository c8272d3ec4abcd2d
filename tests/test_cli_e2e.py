"""CLI end-to-end smoke (SURVEY.md §4.5): train.py runs an epoch on
synthetic data, writes checkpoints, resumes, and evaluates — through the
same argv surface a user drives."""

import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "train.py")


def _run(argv):
    old = sys.argv
    sys.argv = ["train.py", *argv]
    try:
        runpy.run_path(TRAIN, run_name="__main__")
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_ckpt"))


BASE = [
    "--synthetic", "--arch", "mnasnet0_35", "--num-classes", "8",
    "--image-size", "32", "--batch-size", "16", "--synthetic-size", "48",
    "--workers", "0", "--print-freq", "100", "--dtype", "float32",
    "--seed", "0",
]


def test_cli_train_writes_checkpoint(outdir, capsys):
    _run([*BASE, "--epochs", "1", "--output-dir", outdir])
    out = capsys.readouterr().out
    assert "epoch 0:" in out and "best=" in out
    assert "0" in os.listdir(outdir)


def test_cli_resume_and_evaluate(outdir, capsys):
    _run([*BASE, "--epochs", "1", "--output-dir", outdir,
          "--resume", outdir, "--evaluate"])
    out = capsys.readouterr().out
    assert "resumed from epoch 0" in out
    assert "Acc@1" in out


def test_cli_no_sync_bn_trains(outdir, capsys, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("cli_nosyncbn"))
    _run([*BASE, "--epochs", "1", "--no-sync-bn", "--output-dir", out2])
    out = capsys.readouterr().out
    assert "epoch 0:" in out


def test_cli_bn_recalibrate_runs_and_saves(outdir, capsys):
    _run([*BASE, "--epochs", "1", "--bn-recalibrate", "2",
          "--output-dir", outdir])
    out = capsys.readouterr().out
    assert "[bn-recal] running stats recomputed over 2 batches" in out
    assert "bn-recalibrated: acc1=" in out
    # recal checkpoint saved one past the last training epoch
    assert "1" in os.listdir(outdir)


def test_cli_deterministic_flag_resolution():
    sys.path.insert(0, REPO)
    try:
        import importlib
        train_mod = importlib.import_module("train")
    finally:
        sys.path.remove(REPO)
    args = train_mod.parse_args(["--synthetic", "--deterministic"])
    assert args.seed == 0
    assert args.bn_stats == "two_pass"
    args2 = train_mod.parse_args(["--synthetic", "--deterministic",
                                  "--seed", "7"])
    assert args2.seed == 7
    # bare --pretrained (reference boolean form) parses
    args3 = train_mod.parse_args(["--synthetic", "--pretrained"])
    assert args3.pretrained == "__auto__"
    # --no-sync-bn / --no-scale-lr surface
    args4 = train_mod.parse_args(["--synthetic", "--no-sync-bn",
                                  "--no-scale-lr"])
    assert args4.sync_bn is False and args4.scale_lr is False


def test_cli_deterministic_runs_bitwise_identical(tmp_path_factory, capsys):
    """--deterministic end-to-end: two fresh runs produce bit-identical
    parameters (SURVEY.md §5.2)."""
    import jax
    import numpy as np

    from mnasnet_tpu.train.checkpoint import CheckpointManager

    dirs = [str(tmp_path_factory.mktemp(f"cli_det{i}")) for i in range(2)]
    for d in dirs:
        _run([*BASE[:-2], "--deterministic", "--epochs", "1",
              "--output-dir", d])
    capsys.readouterr()

    params = []
    for d in dirs:
        # template-free: works regardless of the run's optimizer/fused
        # state layout (train.py defaults to fused='small' since r2)
        variables, _, _ = CheckpointManager(d).restore_variables()
        params.append(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params[0], params[1],
    )
