"""Tuned XLA compile options resolution (utils/xla_options.py).

The tuned flags are TPU-compiler env options; on the CPU test backend the
resolver must return None (passing them to the CPU client would fail), and
the MNASNET_TPU_XLA_OPTIONS env escape hatch must parse/disable correctly.
"""

import json

import pytest

from mnasnet_tpu.utils.xla_options import (
    TPU_STEP_OPTIONS,
    default_compiler_options,
)


@pytest.mark.parametrize("mode", ["train", "infer"])
def test_cpu_backend_gets_none(monkeypatch, mode):
    monkeypatch.delenv("MNASNET_TPU_XLA_OPTIONS", raising=False)
    assert default_compiler_options(mode) is None  # conftest pins cpu


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        default_compiler_options("serving")


@pytest.mark.parametrize("val", ["none", "off", "", "0", "NONE"])
def test_env_disable(monkeypatch, val):
    monkeypatch.setenv("MNASNET_TPU_XLA_OPTIONS", val)
    assert default_compiler_options("train") is None
    assert default_compiler_options("infer") is None


def test_env_override_is_verbatim_for_both_modes(monkeypatch):
    override = {"xla_tpu_nd_short_transfer_max_chunks": "8192"}
    monkeypatch.setenv("MNASNET_TPU_XLA_OPTIONS", json.dumps(override))
    assert default_compiler_options("train") == override
    assert default_compiler_options("infer") == override


def test_env_override_bad_json_raises(monkeypatch):
    monkeypatch.setenv("MNASNET_TPU_XLA_OPTIONS", "{not json")
    with pytest.raises(json.JSONDecodeError):
        default_compiler_options("train")


def test_tuned_sets_are_stringly_typed():
    # PJRT env-options must be string-valued; a non-str value would fail
    # only at compile time on the TPU, so pin it here.
    assert set(TPU_STEP_OPTIONS) == {"train", "infer"}
    for opts in TPU_STEP_OPTIONS.values():
        for k, v in opts.items():
            assert isinstance(k, str) and isinstance(v, str)


def test_trainer_jits_on_cpu_with_default_options():
    """Trainer must construct (and its steps compile) on the CPU backend
    with the default resolver in place — i.e. options resolve to None and
    never reach the CPU client."""
    import jax
    import jax.numpy as jnp

    from mnasnet_tpu import create_model
    from mnasnet_tpu.train.optim import create_optimizer
    from mnasnet_tpu.train.trainer import Trainer

    model = create_model("mnasnet0_5", num_classes=4)
    tx = create_optimizer("sgd", 0.1)
    tr = Trainer(model, tx, print_freq=1000)
    state = tr.create_state(jax.random.PRNGKey(0), image_size=32)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    y = jnp.zeros((8,), jnp.int32)
    state2, metrics = tr._train_step(state, x, y)
    assert int(metrics["count"]) == 8
