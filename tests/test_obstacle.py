"""Obstacle problem (example 01) golden tests.

Oracle: the reference's FD scheme (obstacle_finite_difference.jl:29-113) on
[-1,1]^2 — same obstacle, same alpha rule — and qualitative LVPP behavior
(monotone energy, feasibility -> 0, converged in a moderate number of outer
iterations with the double-exponential rule)."""

import numpy as np
import pytest

from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models import (
    solve_obstacle_problem, spherical_cap_obstacle)


@pytest.fixture(scope="module")
def solved():
    mesh = rectangle_mesh(16, 16, p0=(-1.0, -1.0), p1=(1.0, 1.0))
    prob, result = solve_obstacle_problem(
        mesh, polynomial_order=1, alpha_scheme="double_exponential",
        alpha_max=1e2, tol_exit=1e-6, verbose=False)
    return mesh, prob, result


def test_converged(solved):
    _, _, result = solved
    assert result.converged
    assert 3 <= result.iterations <= 30
    assert result.total_newton < 120


def test_solution_above_obstacle(solved):
    mesh, prob, result = solved
    u = prob.u(result)
    phi = spherical_cap_obstacle(prob.V.dof_points.T)
    # feasibility up to discretization tolerance
    assert float(np.min(u - phi)) > -0.05
    # contact: u touches phi near the center
    center = np.argmin(np.sum(prob.V.dof_points**2, axis=1))
    assert abs(u[center] - phi[center]) < 0.05
    # boundary values are zero
    bdofs = prob.V.boundary_dofs()
    assert np.allclose(u[bdofs], 0.0, atol=1e-12)


def test_observables_recorded(solved):
    _, _, result = solved
    n = result.iterations
    for key in ("Energy", "Complementarity", "Feasibility", "Dual Feasibility",
                "Latent increments"):
        assert len(result.observables[key]) == n
    # complementarity decreases toward the end
    compl = result.observables["Complementarity"]
    assert compl[-1] < compl[0]
    # energies decrease from iteration 1 on (proximal descent)
    en = result.observables["Energy"]
    assert en[-1] <= en[0] + 1e-10


def test_csv_output(tmp_path, solved):
    _, _, result = solved
    out = tmp_path / "obstacle.csv"
    result.to_csv(out)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == result.iterations + 1
    assert "Newton steps" in lines[0]


def test_matches_fd_oracle():
    """Compare the FEM P1 solution on a structured square grid against the
    reference FD scheme's math (5-point Laplacian LVPP) at the grid points."""
    N = 17
    mesh = rectangle_mesh(N - 1, N - 1, p0=(-1.0, -1.0), p1=(1.0, 1.0))
    prob, result = solve_obstacle_problem(
        mesh, polynomial_order=1, alpha_scheme="double_exponential",
        alpha_max=1e2, tol_exit=1e-8, verbose=False)
    u_fem = prob.u(result)

    u_fd = _fd_lvpp(N)
    # match FD values at shared grid points (moderate tol: different
    # discretizations of the same problem)
    pts = prob.V.dof_points
    xs = np.linspace(-1, 1, N)
    fd_interp = {}
    for i, x in enumerate(xs):
        for j, y in enumerate(xs):
            fd_interp[(round(x, 9), round(y, 9))] = u_fd[i, j]
    err = []
    for d, p in enumerate(pts):
        key = (round(p[0], 9), round(p[1], 9))
        if key in fd_interp:
            err.append(u_fem[d] - fd_interp[key])
    err = np.array(err)
    assert len(err) == N * N
    assert np.max(np.abs(err)) < 0.05, np.max(np.abs(err))


def _fd_lvpp(N):
    """Direct port of the FD oracle's *math* (obstacle_finite_difference.jl)
    in numpy/scipy, used only as a test oracle."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    xs = np.linspace(-1, 1, N)
    h = xs[1] - xs[0]
    main = 2 * np.ones(N) / h**2
    off = -np.ones(N - 1) / h**2
    A1 = sp.diags([off, main, off], [-1, 0, 1])
    I = sp.identity(N)
    A = (sp.kron(A1, I) + sp.kron(I, A1)).tocsr()
    n = N * N
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    phiv = spherical_cap_obstacle(np.stack([X.ravel(), Y.ravel()]))
    idx = np.arange(n).reshape(N, N)
    bcs = np.unique(np.concatenate(
        [idx[0], idx[-1], idx[:, 0], idx[:, -1]]))
    mask = np.ones(n, bool)
    mask[bcs] = False

    u, psi, w, u_prev = np.zeros(n), np.ones(n), np.zeros(n), np.zeros(n)
    alpha = 1.0
    for k in range(100):
        alpha = min(max(1.0 * 1.5 ** (1.5**k) - alpha, 1.0), 1e2)
        for it in range(50):
            g = np.concatenate([alpha * (A @ u) + psi - w,
                                u - np.exp(psi) - phiv])
            g[bcs] = 0.0
            g[n + bcs] = 0.0
            if it == 0:
                nrm0 = np.linalg.norm(g)
            if np.linalg.norm(g) / nrm0 < 1e-4 and it > 0:
                break
            J = sp.bmat([[alpha * A, sp.identity(n)],
                         [sp.identity(n), -sp.diags(np.exp(psi))]]).tolil()
            all_bcs = np.concatenate([bcs, n + bcs])
            J[all_bcs, :] = 0
            J[:, all_bcs] = 0
            J[all_bcs, all_bcs] = 1
            dz = spla.spsolve(J.tocsr(), -g)
            u += dz[:n]
            psi += dz[n:]
        w = psi.copy()
        if np.linalg.norm(u - u_prev) < 1e-9:
            break
        u_prev = u.copy()
    return u.reshape(N, N)


def test_disk_mesh_reference_protocol():
    """The canonical run: unstructured disk, double-exponential alpha —
    LVPP outer/Newton counts in the reference's observed range and the
    CSV schema columns present (obstacle_pg.py:244-260)."""
    from proximalgalerkin_tpu.mesh.unstructured import create_disk_mesh
    mesh = create_disk_mesh(0.12)
    prob, result = solve_obstacle_problem(
        mesh, polynomial_order=1, alpha_scheme="double_exponential",
        alpha_max=1e2, tol_exit=1e-6, verbose=False)
    assert result.converged
    assert 3 <= result.iterations <= 25
    assert result.total_newton <= 100
    import tempfile, pathlib, csv as _csv
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "out.csv"
        result.to_csv(f, extra={"Polynomial order": 1,
                                "dofs": prob.V.num_scalar_dofs,
                                "Step size rule": "double_exponential"})
        header = f.read_text().splitlines()[0]
        for col in ("Energy", "Complementarity", "Feasibility",
                    "Dual Feasibility", "Newton steps", "Step sizes",
                    "Primal increments", "Latent increments",
                    "Polynomial order", "dofs", "Step size rule"):
            assert col in header, col
