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
