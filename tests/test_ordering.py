"""Nested-dissection ordering + lagged-LU Newton (la/ordering.py,
NewtonSolver._lu_direction) — the MUMPS-ordering/factor-reuse stand-in
used by the multiphase record (reference multiphase_dolfinx.py protocol:
~31k direction solves, infeasible at COLAMD fill)."""

import numpy as np
import pytest
import scipy.sparse as sp

from proximalgalerkin_tpu.la.ordering import (
    best_field_rotation, block_permutations, coordinate_nd_order,
    node_adjacency)
from proximalgalerkin_tpu.la.direct import LUFactorization


def _grid_graph(n):
    idx = np.arange(n * n).reshape(n, n)
    rows, cols = [], []
    for di, dj in ((0, 1), (1, 0)):
        a = idx[: n - di, : n - dj].ravel()
        b = idx[di:, dj:].ravel()
        rows += [a, b]
        cols += [b, a]
    r = np.concatenate(rows + [np.arange(n * n)])
    c = np.concatenate(cols + [np.arange(n * n)])
    A = sp.coo_matrix((np.ones(len(r)), (r, c)), shape=(n * n, n * n))
    return A.tocsr()


def test_nd_order_is_permutation():
    n = 13
    A = _grid_graph(n)
    pts = np.stack(np.meshgrid(np.arange(n), np.arange(n),
                               indexing="ij"), -1).reshape(-1, 2).astype(float)
    order = coordinate_nd_order(A, pts, leaf=8)
    assert np.array_equal(np.sort(order), np.arange(n * n))


def test_nd_reduces_fill_vs_natural():
    import scipy.sparse.linalg as spla
    n = 48
    G = _grid_graph(n)
    # SPD laplacian-like matrix on the grid
    A = (sp.diags(np.full(n * n, 5.0)) - G).tocsr()
    pts = np.stack(np.meshgrid(np.arange(n), np.arange(n),
                               indexing="ij"), -1).reshape(-1, 2).astype(float)
    order = coordinate_nd_order(G, pts, leaf=8)
    dof_nodes = np.arange(n * n)
    pr, pc = block_permutations(dof_nodes, order)
    lu_nat = spla.splu(A.tocsc(), permc_spec="NATURAL")
    lu_col = spla.splu(A.tocsc(), permc_spec="COLAMD")
    lu_nd = spla.splu(A[pr][:, pc].tocsc(), permc_spec="NATURAL")
    fill = lu_nd.L.nnz + lu_nd.U.nnz
    assert fill < 0.5 * (lu_nat.L.nnz + lu_nat.U.nnz)
    assert fill < lu_col.L.nnz + lu_col.U.nnz
    # permuted solve round-trips
    b = np.random.default_rng(0).standard_normal(n * n)
    x = LUFactorization(A, perm_r=pr, perm_c=pc, pivot_thresh=0.01).solve(b)
    assert np.linalg.norm(A @ x - b) < 1e-10 * np.linalg.norm(b)


def test_field_rotation_detects_zero_diagonal_block():
    # 2-field system per node: [[M, M], [M, 0]] — field-1 diagonal block
    # is zero; the rotation must pair field-1 rows with field-0 columns.
    n_nodes = 25
    M = sp.diags(np.full(n_nodes, 2.0)) + sp.diags(
        np.full(n_nodes - 1, -0.5), 1) + sp.diags(
        np.full(n_nodes - 1, -0.5), -1)
    Z = sp.csr_matrix((n_nodes, n_nodes))
    A = sp.bmat([[M, M], [M, Z]]).tocsr()
    dof_nodes = np.concatenate([np.arange(n_nodes), np.arange(n_nodes)])
    field_of = np.concatenate([np.zeros(n_nodes, np.int64),
                               np.ones(n_nodes, np.int64)])
    rot = best_field_rotation(A, dof_nodes, field_of)
    assert rot == {0: 1, 1: 0}


def test_multiphase_lagged_nd_matches_plain_lu():
    import jax
    from proximalgalerkin_tpu.models.multiphase import solve_multiphase
    with jax.default_device(jax.devices("cpu")[0]):
        base = solve_multiphase(N=10, M=10, tau0=1e-4, T=2e-4,
                                verbose=False)
        lagged = solve_multiphase(
            N=10, M=10, tau0=1e-4, T=2e-4, verbose=False,
            solver_options={"pc_factor_lag": 1,
                            "pc_factor_ordering": "nd"})
    assert np.array_equal(base.newton_iterations, lagged.newton_iterations)
    assert np.array_equal(base.lvpp_iterations, lagged.lvpp_iterations)
    assert np.max(np.abs(base.u - lagged.u)) < 1e-8
