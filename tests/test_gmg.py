"""Geometric multigrid (la/gmg.py) on the structured-grid Schur operator.

Validates (a) stencil_apply reproduces the DIA-assembled P1 operator
exactly on a right-diagonal rectangle_mesh, and (b) the V-cycle is a
textbook-quality preconditioner on Laplacian-dominated systems (order of
magnitude fewer CG iterations than Jacobi)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proximalgalerkin_tpu.la import gmg
from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver


def _pcg(S, b, Minv, tol=1e-10, maxiter=2000):
    x = jnp.zeros_like(b)
    r = b
    z = Minv(r)
    p = z
    rz = jnp.vdot(r, z)
    b2 = float(jnp.vdot(b, b))
    its = 0
    for i in range(maxiter):
        Ap = S(p)
        a = rz / jnp.vdot(p, Ap)
        x = x + a * p
        r = r - a * Ap
        its = i + 1
        if float(jnp.vdot(r, r)) <= tol * tol * b2:
            break
        z = Minv(r)
        rz2 = jnp.vdot(r, z)
        p = z + (rz2 / rz) * p
        rz = rz2
    return x, its


def test_stencil_matches_dia_operator():
    """stencil_apply == free*(alpha*A + m2d) + (1-free) with A the
    DIA-assembled P1 stiffness (rectangle_mesh numbering is lexicographic
    so flat dof vectors reshape to the (n+1, n+1) grid)."""
    n = 32
    mesh = rectangle_mesh(n, n, p0=(-1, -1), p1=(1, 1))
    s = P1ObstacleSolver(mesh)
    m = n + 1
    rng = np.random.default_rng(0)
    free = s.interior > 0
    m2d = jnp.asarray(np.where(np.asarray(free), rng.uniform(0.1, 3.0, s.N), 0.0))
    alpha = jnp.asarray(7.5)
    v = jnp.asarray(rng.normal(size=s.N))

    vf = jnp.where(free, v, 0.0)
    want = jnp.where(free, alpha * s.dia.spmv(vf) + m2d * v, v)
    got = gmg.stencil_apply(v.reshape(m, m), alpha,
                            m2d.reshape(m, m), free.reshape(m, m))
    assert float(jnp.abs(got.reshape(-1) - want).max()) < 1e-11


def test_vcycle_textbook_on_poisson():
    """MG-PCG on the interior Laplacian: <= 15 iterations where Jacobi-CG
    needs hundreds, identical solution."""
    m = 65
    free_np = np.zeros((m, m), bool)
    free_np[1:-1, 1:-1] = True
    free = jnp.asarray(free_np)
    h2 = (2.0 / (m - 1)) ** 2
    m2d = jnp.where(free, h2, 0.0)
    al = jnp.asarray(1.0)
    rng = np.random.default_rng(1)
    b = jnp.asarray(np.where(free_np, rng.normal(size=(m, m)), 0.0))

    S = jax.jit(lambda v: gmg.stencil_apply(v, al, m2d, free))
    levels = gmg.mg_levels_for(m)
    assert levels >= 2
    hier = gmg.build_hierarchy(m2d, free, levels)
    vc = jax.jit(lambda r: gmg.v_cycle(r, hier, al))
    diag = jnp.where(free, 4.0 * al + m2d, 1.0)
    jac = jax.jit(lambda r: r / diag)

    x_j, it_j = _pcg(S, b, jac)
    x_m, it_m = _pcg(S, b, vc)
    assert it_m <= 15, it_m
    assert it_j >= 5 * it_m, (it_j, it_m)
    assert float(jnp.abs(x_j - x_m).max()) < 1e-7


def test_restrict_prolong_shapes_and_partition():
    """Transfer operators: shapes halve/double; full-weighting preserves
    constants in the interior; prolongation of a constant is constant."""
    m = 17
    r = jnp.ones((m, m))
    rc = gmg.restrict(r)
    assert rc.shape == (9, 9)
    # interior coarse points see the full 9-point weight sum = 1
    assert float(jnp.abs(rc[1:-1, 1:-1] - 1.0).max()) < 1e-14
    f = gmg.prolong(jnp.ones((9, 9)), (m, m))
    assert f.shape == (m, m)
    assert float(jnp.abs(f - 1.0).max()) < 1e-14
