"""Example 01 — QP formulation of the obstacle problem + cross-solver
comparison driver.

Rebuilds examples/01_obstacle_problem/obstacle_ipopt_galahad.py (QP setup
:44-91, ObstacleProblem class :94-127) and compare_all.py (five solvers on
one mesh, iteration-count table :19-182), against our own assembled
matrices and the in-framework TRB / interior-point / SNES-VI / LVPP
solvers instead of GALAHAD / IPOPT / PETSc.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..assembly import VolumeForm
from ..mesh.mesh import Mesh
from ..solve.optimization import interior_point_solver, trb_solver
from ..spaces import FunctionSpace, MixedSpace
from .obstacle import spherical_cap_obstacle


def assemble_qp_operators(mesh: Mesh, degree: int = 1):
    """Stiffness S, (consistent) mass M, and dof data for the QP form
    (reference setup_problem, obstacle_ipopt_galahad.py:44-91)."""
    V = FunctionSpace.create(mesh, degree)
    space = MixedSpace([("u", V)])
    stiff = VolumeForm(space, lambda x, u, gu, c, gc, k: {"u": (None, gu["u"])},
                       quadrature_degree=2 * degree)
    mass = VolumeForm(space, lambda x, u, gu, c, gc, k: {"u": (u["u"], None)},
                      quadrature_degree=2 * degree)
    S = stiff.assemble_scipy(space.zeros())
    M = mass.assemble_scipy(space.zeros())
    return V, S.tocsr(), M.tocsr()


class ObstacleQP:
    """min 0.5 x'Sx - (Mf)'x  s.t.  x >= phi, x = 0 on the boundary
    (enforced through equal bounds, the reference's 'Dirichlet bounds'
    device, optimization.py:81)."""

    def __init__(self, S: sp.csr_matrix, M: sp.csr_matrix,
                 f: np.ndarray):
        self.S = S
        self.b = M @ f
        Lo = sp.tril(S).tocoo()
        self._rows, self._cols = Lo.row.astype(np.int32), Lo.col.astype(np.int32)
        self._lower = Lo
        self.total_iteration_count = 0

    def objective(self, x):
        self.total_iteration_count += 1
        return 0.5 * x @ (self.S @ x) - self.b @ x

    def gradient(self, x):
        return self.S @ x - self.b

    def pure_hessian(self, x):
        return self._lower.data

    def hessian(self, x, lagrange, obj_factor):
        return obj_factor * self.pure_hessian(x)

    def hessianstructure(self):
        return self._rows, self._cols


@dataclass
class CompareResult:
    iterations: Dict[str, int]
    solutions: Dict[str, np.ndarray]

    def table(self) -> str:
        lines = ["Solver               Iterations",
                 "------               ----------"]
        for k, v in self.iterations.items():
            lines.append(f"{k:<20} {v}")
        return "\n".join(lines)


def compare_all(mesh: Mesh,
                obstacle: Callable = spherical_cap_obstacle,
                f: float = 0.0,
                max_iter: int = 500,
                tol: float = 1e-4,
                verbose: bool = True) -> CompareResult:
    """Run TRB (galahad stand-in), LVPP P1 and P2, interior point with and
    without exact Hessian, and semismooth VI Newton on the same mesh —
    the compare_all.py benchmark harness (:19-182)."""
    from ..core.logging import rank_print
    from ..solve.vi import vi_solve
    from .obstacle import setup_obstacle_problem

    its: Dict[str, int] = {}
    sols: Dict[str, np.ndarray] = {}

    V, S, M = assemble_qp_operators(mesh, 1)
    n = V.num_dofs
    phi = obstacle(V.dof_points.T)
    bdofs = np.asarray(V.boundary_dofs())
    lb = phi.copy()
    ub = np.full(n, np.inf)
    lb[bdofs] = 0.0
    ub[bdofs] = 0.0
    fvec = np.full(n, f)
    x0 = np.maximum(lb, 0.0)

    qp = ObstacleQP(S, M, fvec)
    x_trb, it_trb = trb_solver(qp, x0.copy(), (lb, ub), max_iter=max_iter,
                               tol=tol)
    its["Galahad (TRB)"] = it_trb
    sols["Galahad (TRB)"] = x_trb

    for order in (1, 2):
        prob = setup_obstacle_problem(
            mesh, polynomial_order=order, alpha_scheme="double_exponential",
            alpha_max=1e2, tol_exit=tol, verbose=False,
            maximum_number_of_outer_loop_iterations=max_iter)
        res = prob.solve()
        its[f"LVPP (P{order})"] = res.total_newton
        sols[f"LVPP (P{order})"] = prob.u(res)

    qp2 = ObstacleQP(S, M, fvec)
    x_ip, it_ip = interior_point_solver(qp2, x0.copy(), (lb, ub),
                                        max_iter=max_iter, tol=tol,
                                        activate_hessian=True)
    its["IPOPT (w. Hessian)"] = it_ip
    sols["IPOPT (w. Hessian)"] = x_ip
    qp3 = ObstacleQP(S, M, fvec)
    x_ip2, it_ip2 = interior_point_solver(qp3, x0.copy(), (lb, ub),
                                          max_iter=max_iter, tol=tol,
                                          activate_hessian=False)
    its["IPOPT (no Hessian)"] = it_ip2
    sols["IPOPT (no Hessian)"] = x_ip2

    # SNES-VI: F(u) = S u - M f with bounds phi <= u
    from ..solve.nonlinear import NonlinearProblem
    from ..spaces import DirichletBC
    space = MixedSpace([("u", V)])
    form = VolumeForm(space, lambda x, u, gu, c, gc, k:
                      {"u": (-f, gu["u"])}, quadrature_degree=2)
    bc = DirichletBC.from_marker("u", V, value=0.0)
    nlp = NonlinearProblem(form, [bc])
    lb_vi = phi.copy()
    x_vi, reason, it_vi = vi_solve(nlp, jnp.zeros(n), lb_vi, None,
                                   {"snes_atol": 1e-8, "snes_rtol": 1e-8,
                                    "snes_max_it": 1000})
    its["SNES-VI"] = it_vi
    sols["SNES-VI"] = np.asarray(x_vi)

    result = CompareResult(iterations=its, solutions=sols)
    if verbose:
        rank_print(result.table())
    return result
