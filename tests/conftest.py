"""Test env: force JAX onto CPU with 8 fake devices.

The axon sitecustomize imports jax at interpreter start, so JAX_PLATFORMS in
os.environ is read before pytest ever runs — the platform must be overridden
via jax.config instead. XLA_FLAGS is still honored at first backend init,
which happens lazily (no backend exists yet when conftest runs).

Multi-device tests (pjit/shard_map data parallelism, DDP-equivalence
invariant) run against this virtual 8-device mesh — SURVEY.md §4.3. The real
TPU path is exercised by bench.py / __graft_entry__.py outside pytest.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
