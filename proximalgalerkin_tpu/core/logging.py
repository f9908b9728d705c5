"""Logging and monitor utilities.

Mirrors the reference's rank-gated printing (obstacle_pg.py:32-40) and the
PETSc monitor semantics (`snes_monitor`, `ksp_monitor` options): monitors are
callbacks invoked once per iteration with (iteration, norm).
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Optional

import jax


def process_index() -> int:
    try:
        return jax.process_index()
    except Exception:
        return 0


def rank_print(string: str, rank: int = 0, file=None) -> None:
    """Print only on one process (the multi-host analogue of MPI rank-0
    printing in the reference, obstacle_pg.py:32-40)."""
    if process_index() == rank:
        print(string, file=file or sys.stdout, flush=True)


class Monitor:
    """SNES/KSP-style iteration monitor: prints `  k NAME norm ...` lines."""

    def __init__(self, name: str, enabled: bool = False,
                 callback: Optional[Callable[[int, float], None]] = None):
        self.name = name
        self.enabled = enabled
        self.callback = callback
        self.history: list[float] = []

    def __call__(self, it: int, norm: float) -> None:
        self.history.append(float(norm))
        if self.enabled:
            rank_print(f"  {it:3d} {self.name} norm {norm:.12e}")
        if self.callback is not None:
            self.callback(it, float(norm))


class PhaseTimer:
    """Per-phase wall-clock accumulator (assembly / linear solve / outer loop),
    the rebuild's replacement for the reference's ad-hoc Julia `@elapsed`
    timings (thermoforming_gridap.jl:112,134)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    class _Ctx:
        def __init__(self, timer: "PhaseTimer", phase: str):
            self.timer, self.phase = timer, phase

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            self.timer.totals[self.phase] = self.timer.totals.get(self.phase, 0.0) + dt
            self.timer.counts[self.phase] = self.timer.counts.get(self.phase, 0) + 1
            return False

    def phase(self, name: str) -> "PhaseTimer._Ctx":
        return PhaseTimer._Ctx(self, name)

    def report(self) -> str:
        lines = [f"{k}: {v:.4f}s over {self.counts[k]} calls" for k, v in self.totals.items()]
        return "\n".join(lines)
