"""Cross-solver consistency (the reference's compare_all.py as a test):
five solvers, one mesh, solutions must agree — the strongest correctness
oracle in the reference's own protocol (SURVEY.md §4)."""

import numpy as np
import pytest

from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_qp import compare_all


@pytest.fixture(scope="module")
def result():
    mesh = rectangle_mesh(12, 12, p0=(-1.0, -1.0), p1=(1.0, 1.0))
    return compare_all(mesh, verbose=False, max_iter=500, tol=1e-4)


def test_all_solvers_ran(result):
    for name in ("Galahad (TRB)", "LVPP (P1)", "LVPP (P2)",
                 "IPOPT (w. Hessian)", "IPOPT (no Hessian)", "SNES-VI"):
        assert name in result.iterations
        assert 0 < result.iterations[name] <= 1000


def test_solutions_agree(result):
    """P1-dof-valued solutions from TRB, IP, VI, LVPP(P1) agree pointwise."""
    ref = result.solutions["SNES-VI"]
    for name in ("Galahad (TRB)", "LVPP (P1)", "IPOPT (w. Hessian)"):
        diff = np.abs(result.solutions[name] - ref).max()
        assert diff < 5e-2, (name, diff)
