"""SNES-compatible converged-reason codes.

The reference's control flow branches on PETSc's SNES converged reasons
(`converged_reason > 0` commit gate at src/lvpp/problem.py:120-123, failure
retry loops keyed on negative reasons in examples/03_fracture/
fracture_dolfinx.py:236-264). We reproduce the integer protocol so retry
state machines behave identically.
"""

from __future__ import annotations

import enum


class ConvergedReason(enum.IntEnum):
    # Converged (positive)
    CONVERGED_FNORM_ABS = 2      # ||F|| < atol
    CONVERGED_FNORM_RELATIVE = 3 # ||F|| < rtol * ||F0||
    CONVERGED_SNORM_RELATIVE = 4 # ||dx|| < stol * ||x||
    CONVERGED_ITS = 5            # preonly/its reached (linear)
    # Still iterating
    ITERATING = 0
    # Diverged (negative)
    DIVERGED_FUNCTION_COUNT = -2
    DIVERGED_LINEAR_SOLVE = -3
    DIVERGED_FNORM_NAN = -4
    DIVERGED_MAX_IT = -5
    DIVERGED_LINE_SEARCH = -6
    DIVERGED_INNER = -7
    DIVERGED_LOCAL_MIN = -8
    DIVERGED_DTOL = -9

    @property
    def converged(self) -> bool:
        return self.value > 0


class NotConvergedError(RuntimeError):
    """Raised when a solve fails and `*_error_if_not_converged` is set, or by
    drivers that implement the reference's try/except retry pattern
    (fracture_dolfinx.py:224-264)."""

    def __init__(self, reason: ConvergedReason, message: str = ""):
        self.reason = reason
        super().__init__(message or f"solver did not converge: {reason.name}")
