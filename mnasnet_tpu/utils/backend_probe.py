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
