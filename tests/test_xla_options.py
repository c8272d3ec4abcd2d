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


def test_cpu_backend_gets_none(monkeypatch):
    monkeypatch.delenv("MNASNET_TPU_XLA_OPTIONS", raising=False)
    assert default_compiler_options() is None  # conftest pins cpu


@pytest.mark.parametrize("val", ["none", "off", "", "0", "NONE"])
def test_env_disable(monkeypatch, val):
    monkeypatch.setenv("MNASNET_TPU_XLA_OPTIONS", val)
    assert default_compiler_options() is None


def test_env_override_is_verbatim(monkeypatch):
    override = {"xla_tpu_nd_short_transfer_max_chunks": "8192"}
    monkeypatch.setenv("MNASNET_TPU_XLA_OPTIONS", json.dumps(override))
    assert default_compiler_options() == override


def test_env_override_bad_json_raises(monkeypatch):
    monkeypatch.setenv("MNASNET_TPU_XLA_OPTIONS", "{not json")
    with pytest.raises(json.JSONDecodeError):
        default_compiler_options()


def test_tuned_set_is_stringly_typed():
    # PJRT env-options must be string-valued; a non-str value would fail
    # only at compile time on the TPU, so pin it here.
    for k, v in TPU_STEP_OPTIONS.items():
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
