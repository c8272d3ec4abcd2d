"""Bounded probe of the default JAX backend in a throwaway subprocess.

During an accelerator-runtime outage (observed: axon tunnel outages)
``jax.devices()`` HANGS ~27 minutes in-process instead of raising, wedging
whatever called it. Probing in a subprocess with a timeout converts the
hang into a clean "unreachable" answer. Used by bench.py (fail fast with
an explicit record) and __graft_entry__.py (fall back to the virtual CPU
mesh). The healthy path pays one extra backend init (~10 s on TPU) for the
guarantee — callers that cannot afford that must accept the hang risk
instead.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional


def apply_jax_platforms_env() -> None:
    """Make the ``JAX_PLATFORMS`` env var work despite eager plugin init.

    The axon deployment's sitecustomize imports jax at interpreter start
    and pins ``jax_platforms`` to the TPU plugin, so by the time user code
    runs, ``JAX_PLATFORMS=cpu python tool.py`` has silently NOT selected
    CPU — the tool grabs the real TPU (and deadlocks behind whatever is
    using it; observed with train_smoke.py vs a running sweep). Call this
    right after ``import jax`` in any CLI tool that should honor the env
    var; tests/conftest.py applies the same override for the suite.
    """
    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        jax.config.update("jax_platforms", env)


def default_backend_device_count(
    timeout_s: int = 300, cwd: Optional[str] = None
) -> Optional[int]:
    """Device count of the default backend, or None if the probe fails or
    times out (backend unreachable)."""
    code = "import jax, sys; sys.stdout.write(str(len(jax.devices())))"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], env=dict(os.environ),
            capture_output=True, text=True, timeout=timeout_s, cwd=cwd,
        )
        return int(r.stdout.strip()) if r.returncode == 0 else None
    except (subprocess.TimeoutExpired, ValueError):
        return None
