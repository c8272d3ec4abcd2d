"""``--grad-accum`` auto selection (VERDICT r4 item 6).

Pins the selection math that keeps per-chip microbatches ≤128 — the
measured bs>128 conv-emitter cliff (ACCUM_OVERHEAD_r04.json: accum2 beats
the direct bs256 step 8,095 vs 7,288 img/s; SWEEP_XLAFLAGS_BS256_r04.json:
no compile option recovers the cliff). A user running ``--batch-size 256``
on one chip must get the accumulated step by default, with an explicit
``--grad-accum 1`` escape hatch.
"""

import importlib.util
import os

import pytest

from mnasnet_tpu.train.steps import MICROBATCH_LIMIT, auto_grad_accum

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_train():
    spec = importlib.util.spec_from_file_location(
        "train_cli", os.path.join(REPO, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("per_chip,expected", [
    (32, 1),      # fits — direct step
    (128, 1),     # exactly the limit — direct step
    (256, 2),     # the headline case: 2 × bs128 microbatches
    (512, 4),
    (384, 3),
    (200, 2),     # ceil(200/128)=2 and 2 | 200 → microbatch 100
    (130, 2),     # 2 | 130 → microbatch 65
    (251, 1),     # prime: no divisor without over-splitting → direct
    (254, 2),     # 2 | 254 → microbatch 127
])
def test_auto_grad_accum_values(per_chip, expected):
    assert auto_grad_accum(per_chip) == expected


def test_limit_is_the_measured_cliff():
    assert MICROBATCH_LIMIT == 128


def test_resolver_selects_on_tpu_only():
    train = _load_train()
    kw = dict(sync_bn=True, fused_updates=True)
    # Single chip, bs256 → accum2 on TPU backends; direct elsewhere.
    assert train.resolve_auto_grad_accum(256, 1, "tpu", **kw) == 2
    assert train.resolve_auto_grad_accum(256, 1, "axon", **kw) == 2
    assert train.resolve_auto_grad_accum(256, 1, "cpu", **kw) == 1
    # 8-chip global 1024 → per-chip 128 → direct; global 2048 → accum2.
    assert train.resolve_auto_grad_accum(1024, 8, "tpu", **kw) == 1
    assert train.resolve_auto_grad_accum(2048, 8, "tpu", **kw) == 2
    # Accum prerequisites explicitly disabled → direct step, no error.
    assert train.resolve_auto_grad_accum(
        256, 1, "tpu", sync_bn=False, fused_updates=True) == 1
    assert train.resolve_auto_grad_accum(
        256, 1, "tpu", sync_bn=True, fused_updates=False) == 1
    # Batch not divisible over the chips → leave it to the sharding layer.
    assert train.resolve_auto_grad_accum(250, 8, "tpu", **kw) == 1


def test_cli_default_is_auto():
    train = _load_train()
    args = train.parse_args(["/dev/null", "--synthetic"])
    assert args.grad_accum == 0  # 0 = auto, resolved after mesh creation
