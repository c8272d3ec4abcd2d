"""Profiling: ``jax.profiler`` trace capture (SURVEY.md §5.1).

The reference had only AverageMeter timing; the rebuild adds real tracing via
the TensorBoard profile plugin (installed in this env). Usage:

    with trace_steps("logs/profile", step_iter=range(10, 20), step=i):
        ...

or the simpler context for a whole region:

    with trace("logs/profile"):
        run_steps()
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTracer:
    """Start/stop a profiler trace over a step window (--profile-steps N:M)."""

    def __init__(self, logdir: str, start: int, stop: int):
        self.logdir = logdir
        self.start_step = start
        self.stop_step = stop
        self._active = False

    def on_step(self, step: int):
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def parse_profile_steps(spec: str):
    """'10:20' → (10, 20); '' → None."""
    if not spec:
        return None
    a, b = spec.split(":")
    return int(a), int(b)
