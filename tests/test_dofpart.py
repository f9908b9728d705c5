"""Golden tests for the dof-partitioned distributed FEM (parallel/dofpart):
sharded residual/Jacobian/Newton must match single-device bit-for-bit up to
roundoff — the rebuild's analogue of the reference's ghostUpdate-correct
MPI assembly (src/lvpp/problem.py:56-66), tested on the 8-virtual-device
CPU mesh the way the reference never tested its MPI paths (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.mesh.unstructured import create_disk_mesh
from proximalgalerkin_tpu.models.obstacle import setup_obstacle_problem
from proximalgalerkin_tpu.parallel.dofpart import DistributedProblem
from proximalgalerkin_tpu.core.config import SolverOptions
from proximalgalerkin_tpu.solve import AlphaScheduler
from proximalgalerkin_tpu.solve.newton import NewtonSolver


def _setup(mesh, order):
    prob = setup_obstacle_problem(mesh, polynomial_order=order, verbose=False)
    p = prob.problem
    space = prob.space
    rng = np.random.default_rng(7)
    x = rng.standard_normal(space.num_dofs)
    psi_k = rng.standard_normal(space.spaces["psi"].num_dofs)
    u_k = rng.standard_normal(space.spaces["u"].num_dofs)
    p.update(coeffs={"psi_k": jnp.asarray(psi_k), "u_k": jnp.asarray(u_k)})
    return p, space, x, psi_k, u_k


def _dist_coeffs(dp, p, psi_k, u_k):
    return {"phi": dp.scatter_cellq(np.asarray(p.coeffs["phi"])),
            "psi_k": dp.scatter_coeff("psi_k", psi_k),
            "u_k": dp.scatter_coeff("u_k", u_k)}


@pytest.mark.parametrize("mesh,order", [
    (rectangle_mesh(13, 11, p0=(-1.0, -1.0), p1=(1.0, 1.0)), 2),
    (create_disk_mesh(0.2), 1),
])
def test_residual_and_jacobian_match_single_device(mesh, order):
    p, space, x, psi_k, u_k = _setup(mesh, order)
    F_ref = np.asarray(p.residual(jnp.asarray(x)))

    dp = DistributedProblem(p)
    assert dp.nd == 8
    xs = dp.scatter(x)
    coeffs = _dist_coeffs(dp, p, psi_k, u_k)
    F_d = dp.gather(dp.residual(xs, coeffs))
    scale = max(1.0, float(np.max(np.abs(F_ref))))
    assert np.max(np.abs(F_d - F_ref)) / scale < 1e-12

    rng = np.random.default_rng(3)
    v = rng.standard_normal(space.num_dofs)
    Jv_ref = np.asarray(p.jacobian_action(jnp.asarray(x))(jnp.asarray(v)))
    Jv_d = dp.gather(dp.jacobian_action(xs, dp.scatter(v), coeffs))
    scale = max(1.0, float(np.max(np.abs(Jv_ref))))
    assert np.max(np.abs(Jv_d - Jv_ref)) / scale < 1e-12


def test_scatter_gather_roundtrip_and_memory():
    mesh = create_disk_mesh(0.2)
    p, space, x, _, _ = _setup(mesh, 1)
    dp = DistributedProblem(p)
    assert np.allclose(dp.gather(dp.scatter(x)), x)
    # per-device dof state is O(N / nd): owned blocks only (plus <= nd-1
    # pad dofs per field), NOT the O(N) replication of the GSPMD mode
    N = space.num_dofs
    assert dp.Bsum <= N / dp.nd + 2 * dp.nd * len(space.names)
    # halos ride a +-1 device ring on strip-ordered meshes
    assert all(dp.parts[f].k <= 2 for f in space.names)


def test_fused_newton_lvpp_matches_single_device():
    """Distributed fused Newton reproduces the single-device host-loop
    LVPP trajectory: identical Newton counts, solutions to ~1e-10."""
    mesh = create_disk_mesh(0.25)
    prob = setup_obstacle_problem(mesh, polynomial_order=1, verbose=False)
    p = prob.problem
    space = prob.space
    N = space.num_dofs
    psi_sl, u_sl = space.slice_of("psi"), space.slice_of("u")

    opts = SolverOptions({
        "snes_rtol": 1e-6, "snes_max_it": 50, "snes_linesearch_type": "none",
        "ksp_type": "minres", "pc_type": "jacobi", "mat_type": "matfree",
        "ksp_rtol": 1e-11, "ksp_atol": 0.0, "ksp_max_it": 2000})
    sched = AlphaScheduler(scheme="double_exponential", alpha_max=1e5)

    sched.reset()
    x = jnp.zeros(N)
    x_k = x
    its_ref = []
    for k in range(3):
        p.update(coeffs={"psi_k": x_k[psi_sl], "u_k": x_k[u_sl]},
                 consts={"alpha": jnp.asarray(sched.value(k))})
        res = NewtonSolver(p, opts).solve(x)
        assert res.converged
        x = res.x
        its_ref.append(res.iterations)
        x_k = x
    x_ref = np.asarray(x)

    dp = DistributedProblem(p)
    newton = dp.newton_solver(ksp="minres", rtol=1e-6, max_it=50,
                              ksp_rtol=1e-11, ksp_max_it=2000)
    phi_sh = dp.scatter_cellq(np.asarray(p.coeffs["phi"]))
    sched.reset()
    xs = dp.scatter(np.zeros(N))
    its_d = []
    for k in range(3):
        coeffs = {"phi": phi_sh, "psi_k": dp.field_to_coeff(xs, "psi"),
                  "u_k": dp.field_to_coeff(xs, "u")}
        xs, nit, fn, f0 = newton(xs, coeffs,
                                 {"alpha": jnp.asarray(sched.value(k))})
        its_d.append(int(nit))
    assert its_d == its_ref
    assert np.max(np.abs(dp.gather(xs) - x_ref)) < 1e-10
