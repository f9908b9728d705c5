"""Host sparse direct solve (scipy SuperLU).

The escape hatch standing in for MUMPS (`pc_factor_mat_solver_type: mumps`
in every reference example, e.g. obstacle_pg.py:131): exact LU on host for
small/medium systems and for verifying the device Krylov path. The TPU fast
path is matrix-free Krylov in la/krylov.py.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def lu_solve(A_csr, b: np.ndarray) -> np.ndarray:
    """One-shot sparse LU solve on host."""
    lu = spla.splu(A_csr.tocsc())
    return lu.solve(np.asarray(b))


class LUFactorization:
    """Reusable factorization (KSPSolve with reused PC in PETSc terms)."""

    def __init__(self, A_csr):
        self._lu = spla.splu(A_csr.tocsc())

    def solve(self, b: np.ndarray) -> np.ndarray:
        return self._lu.solve(np.asarray(b))
