"""Host sparse direct solve (scipy SuperLU).

The escape hatch standing in for MUMPS (`pc_factor_mat_solver_type: mumps`
in every reference example, e.g. obstacle_pg.py:131): exact LU on host for
small/medium systems and for verifying the device Krylov path. The TPU fast
path is matrix-free Krylov in la/krylov.py.

Column ordering: MMD on A^T+A — LVPP Jacobians have symmetric sparsity,
where it halves fill and factor time vs scipy's COLAMD default (measured
at 240k dofs: 12.7 s / 7.5M nnz(L) vs 21.6 s / 15.2M). Falls back to
COLAMD if the symmetric ordering fails (nonsquare/degenerate patterns).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse.linalg as spla


_mmd_ok = True


def _splu(A_csc):
    # MMD halves fill on most LVPP systems but its elimination-order
    # memory estimate can EXCEED COLAMD's on wide-stencil blocks (observed
    # OOM on the 200^2 qdeg-10 gradient-constraint Jacobian where COLAMD
    # factored fine) — after one failure, stick to COLAMD for the process
    # rather than re-paying the failed attempt every Newton step.
    global _mmd_ok
    if _mmd_ok:
        try:
            return spla.splu(A_csc, permc_spec="MMD_AT_PLUS_A")
        except Exception:
            _mmd_ok = False
    return spla.splu(A_csc)


def lu_solve(A_csr, b: np.ndarray) -> np.ndarray:
    """One-shot sparse LU solve on host."""
    return _splu(A_csr.tocsc()).solve(np.asarray(b))


class LUFactorization:
    """Reusable factorization (KSPSolve with reused PC in PETSc terms)."""

    def __init__(self, A_csr):
        self._lu = _splu(A_csr.tocsc())

    def solve(self, b: np.ndarray) -> np.ndarray:
        return self._lu.solve(np.asarray(b))
