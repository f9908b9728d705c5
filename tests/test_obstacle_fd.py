"""FD obstacle solver tests: same math as the reference's Julia FD scheme."""

import numpy as np

from proximalgalerkin_tpu.models.obstacle_fd import (
    fd_obstacle_solve, fd_resolution_sweep)


def test_fd_converges_and_feasible():
    res = fd_obstacle_solve(33, verbose=False)
    assert res.outer_iterations < 20
    # u >= phi - tol in the interior, u = 0 on boundary
    assert res.u[0, :].max() == 0.0 and res.u[-1, :].max() == 0.0
    # LVPP is asymptotically feasible: violation is O(1/alpha_cap)
    assert float((res.u - res.phi).min()) > -5e-3
    # contact at the center
    c = res.u.shape[0] // 2
    assert abs(res.u[c, c] - res.phi[c, c]) < 1e-3


def test_fd_matches_dense_oracle():
    """Cross-check the Schur-CG fused solver against a dense numpy Newton
    solve of the identical FD system."""
    N = 9
    res = fd_obstacle_solve(N)

    # dense oracle
    xs = np.linspace(-1, 1, N)
    h2inv = 1.0 / (xs[1] - xs[0]) ** 2
    from proximalgalerkin_tpu.models import spherical_cap_obstacle
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    phi = spherical_cap_obstacle(np.stack([X.ravel(), Y.ravel()]))
    n = N * N
    A = np.zeros((n, n))
    idx = np.arange(n).reshape(N, N)
    interior = np.zeros((N, N), bool)
    interior[1:-1, 1:-1] = True
    for i in range(N):
        for j in range(N):
            k = idx[i, j]
            if not interior[i, j]:
                A[k, k] = 1.0
                continue
            A[k, k] = 4 * h2inv
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                A[k, idx[i + di, j + dj]] = -h2inv
    ivec = interior.ravel()
    u, psi, w, up = np.zeros(n), np.ones(n), np.zeros(n), np.zeros(n)
    alpha = 1.0
    for k in range(100):
        alpha = min(max(1.5 ** (1.5**k) - alpha, 1.0), 1e2)
        for it in range(50):
            gu = alpha * (A @ u) + np.where(ivec, psi - w, 0.0)
            gu[~ivec] = u[~ivec]
            gp = np.where(ivec, u - np.exp(psi) - phi, 0.0)
            g = np.concatenate([gu, gp])
            if it == 0:
                n0 = np.linalg.norm(g)
            if np.linalg.norm(g) < 1e-4 * n0 and it > 0:
                break
            J = np.block([[alpha * A, np.diag(ivec.astype(float))],
                          [np.diag(ivec.astype(float)),
                           np.diag(np.where(ivec, -np.exp(psi), 1.0))]])
            dz = np.linalg.solve(J, -g)
            u, psi = u + dz[:n], psi + dz[n:]
        w = psi.copy()
        if np.linalg.norm(u - up) < 1e-9:
            break
        up = u.copy()

    assert np.abs(res.u.ravel() - u).max() < 1e-4


def test_fd_sweep_newton_counts():
    its = fd_resolution_sweep(js=(1, 2, 3))
    assert all(5 < n < 200 for n in its), its
