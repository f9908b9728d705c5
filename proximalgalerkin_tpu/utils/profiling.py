"""Profiling hooks: per-phase wall-clock plus optional jax.profiler traces.

The reference has no in-repo tracing (SURVEY.md §5 — only PETSc monitor
options and Julia @elapsed); the rebuild adds phase timers
(core/logging.PhaseTimer, threaded through NewtonSolver) and this
device-trace context for TensorBoard-compatible profiles."""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator

import jax


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/pgtpu_trace",
                 enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the context:

        with device_trace("/tmp/trace"):
            solver.solve()
    """
    if not enabled:
        yield
        return
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profile (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
