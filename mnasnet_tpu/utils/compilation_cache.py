"""Persistent XLA compilation cache for the production CLIs.

The mnasnet1_0 @224 train step costs ~20-40 s to compile through the
remote-compile tunnel, paid again on every restart/resume — the dominant
startup cost for short jobs and elastic restarts (SURVEY.md §5.3 failure
recovery: a preempted worker re-pays full compile on rejoin). JAX ships a
persistent on-disk compile cache keyed on (HLO, compiler version, flags);
pointing it at a stable directory makes the second launch's compiles
near-instant. The reference (torch eager) has no analogue — this is a
TPU/XLA-native operational win.

Resolution order: explicit ``--compilation-cache DIR`` flag → the
``MNASNET_TPU_COMPILATION_CACHE`` env var → disabled.

CPU-backend caveat: reloading a cached XLA:CPU AOT executable logs
"machine feature ... not supported" warnings for tuning pseudo-features
(prefer-no-scatter/gather) even on the same host; execution is correct.
Don't share a CPU cache dir across heterogeneous hosts, though — unlike
TPU executables, CPU AOT results are ISA-specific. ``none``/``off``/``0``
(any case) disable explicitly. The cache composes with the tuned compile
options (utils/xla_options.py): options are part of the cache key, so a
flag change never serves a stale executable.
"""

from __future__ import annotations

import os

_ENV_KEY = "MNASNET_TPU_COMPILATION_CACHE"
_DISABLED = ("", "none", "off", "0")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable the persistent compile cache at ``path`` (or the env var).

    Returns the resolved directory, or None if disabled. Must run before
    the first jit compile to cover it (later calls still cover subsequent
    compiles — jax reads the config at compile time).
    """
    if path is None:
        path = os.environ.get(_ENV_KEY)
    if path is None or path.strip().lower() in _DISABLED:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every model-sized compile (default threshold 1 s would skip
    # small eval graphs on fast toolchains); keep jax's entry-size default.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path


def disable_compilation_cache() -> None:
    """Turn the persistent cache off again (used by tests)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
