"""Test env: force JAX onto CPU with 8 fake devices BEFORE jax import.

Multi-device tests (pjit/shard_map data parallelism, DDP-equivalence
invariant) run against this virtual mesh — SURVEY.md §4.3. The real TPU path
is exercised by bench.py / __graft_entry__.py outside pytest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
