"""Persistent compilation cache wiring (utils/compilation_cache.py).

The cache is a production startup-cost feature (restart/resume skips the
20-40s step compile). On the CPU test backend the cache machinery itself
works, so the tests assert real behavior: entries land on disk under the
resolved dir, resolution order (flag > env > off) holds, and disabling
restores jax defaults.
"""

import os

import pytest

from mnasnet_tpu.utils.compilation_cache import (
    disable_compilation_cache,
    enable_compilation_cache,
)


@pytest.fixture
def restore_cache_config():
    yield
    disable_compilation_cache()


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("MNASNET_TPU_COMPILATION_CACHE", raising=False)
    assert enable_compilation_cache(None) is None


@pytest.mark.parametrize("val", ["none", "off", "0", "", "NONE"])
def test_env_disable(monkeypatch, val):
    monkeypatch.setenv("MNASNET_TPU_COMPILATION_CACHE", val)
    assert enable_compilation_cache(None) is None


def test_flag_beats_env(monkeypatch, tmp_path, restore_cache_config):
    monkeypatch.setenv("MNASNET_TPU_COMPILATION_CACHE", str(tmp_path / "env"))
    resolved = enable_compilation_cache(str(tmp_path / "flag"))
    assert resolved == str(tmp_path / "flag")
    assert os.path.isdir(resolved)


def test_entries_written_and_config_restored(tmp_path, restore_cache_config):
    import jax
    import jax.numpy as jnp

    cache_dir = enable_compilation_cache(str(tmp_path / "cache"))
    assert cache_dir is not None

    # A fresh (non-module-level) jit so this compile can't already be in
    # jax's in-memory cache from another test.
    salt = jnp.float32(3.25)

    @jax.jit
    def fn(a):
        return (a * salt + 1.0).sum()

    jax.block_until_ready(fn(jnp.ones((64, 64), jnp.float32)))
    entries = os.listdir(cache_dir)
    assert entries, "no cache entries written"

    disable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir is None
