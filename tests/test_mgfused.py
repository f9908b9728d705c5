"""Goldens for ops/mgfused.py — the whole-solve fused MG-PCG kernel —
in Pallas interpret mode on CPU (the Mosaic-compiled path is exercised
on hardware by bench.py and records; trajectories match to f32
roundoff, cf. records/mgfused_tpu_probe.log).

Reference relationship: this solver produces the Newton directions the
reference's obstacle examples delegate to MUMPS
(obstacle_pg.py:128-139); the golden below checks it against the XLA
MG-PCG path (ops/mg.pcg) that round-4 benchmarked, on a synthetic
deep-contact Schur state with 1e10 diagonal jumps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proximalgalerkin_tpu.ops import mg
from proximalgalerkin_tpu.ops.mgfused import (FusedMgCg, pad_to_grid,
                                              unpad_from_grid)

f32 = jnp.float32


def _setup(m, seed=0):
    N = m * m
    rng = np.random.default_rng(seed)
    interior = np.ones((m, m))
    interior[[0, -1], :] = 0
    interior[:, [0, -1]] = 0
    interior = interior.reshape(-1)
    xx, yy = np.meshgrid(np.linspace(-1, 1, m), np.linspace(-1, 1, m))
    contact = ((xx ** 2 + yy ** 2) < 0.3).reshape(-1)
    m2d = np.where(contact, 1e10, 1.0) * (1.0 + rng.random(N))
    m2d = np.where(interior > 0, m2d, 0.0)
    alpha = 37.0
    free = interior > 0
    diagS = np.where(free, alpha * 4.0 + m2d, 1.0)
    sqinv = 1.0 / np.sqrt(diagS)
    B = np.where(free, sqinv, 0.0).astype(np.float32)
    C = np.where(free, m2d * sqinv * sqinv, 1.0).astype(np.float32)
    w0 = np.where(free, m2d, mg.PIN).astype(np.float32)
    b = np.where(free, rng.standard_normal(N), 0.0).astype(np.float32)
    return alpha, free, B, C, w0, b, np.sqrt(diagS)


def _s32t(m, alpha, free, B, C):
    alpha32 = jnp.asarray(alpha, f32)
    B32, C32 = jnp.asarray(B), jnp.asarray(C)
    free32 = jnp.asarray(free.astype(np.float32))

    def S32t(vt):
        v2 = (B32 * vt).reshape(m, m)
        y5 = mg.k5_apply(v2).reshape(-1)
        return alpha32 * B32 * (free32 * y5) + C32 * vt

    return S32t


def _fused(m, alpha, B, C, w0, b, tol, maxiter, chunk):
    fu = FusedMgCg(m, chunk=chunk, interpret=True)
    ws = [w0.reshape(m, m)]
    for _ in range(1, fu.nlev):
        ws.append(np.asarray(4.0 * mg.restrict(jnp.asarray(ws[-1], f32))))
    whier = tuple(pad_to_grid(jnp.asarray(w.reshape(-1), f32),
                              w.shape[0]) for w in ws)
    x2, its = fu.solve(pad_to_grid(jnp.asarray(b), m),
                       pad_to_grid(jnp.asarray(B), m),
                       pad_to_grid(jnp.asarray(C), m),
                       whier, alpha, tol, maxiter)
    return np.asarray(unpad_from_grid(x2, m)), int(its)


def test_matches_xla_mgpcg_deep_contact():
    m, tol, maxiter = 33, 1e-6, 500
    alpha, free, B, C, w0, b, sq = _setup(m)
    S32t = _s32t(m, alpha, free, B, C)

    mgpc = mg.make_mg_pc(m)(jnp.asarray(alpha, f32), jnp.asarray(w0))
    sq32 = jnp.asarray(np.where(free, sq, 1.0), f32)
    free32 = jnp.asarray(free.astype(np.float32))
    xr, itr = mg.pcg(S32t, jnp.asarray(b),
                     lambda r: sq32 * free32 * mgpc(sq32 * r),
                     tol, maxiter)

    xf, itf = _fused(m, alpha, B, C, w0, b, tol, maxiter, chunk=16)
    bn = np.linalg.norm(b)
    rres_f = np.linalg.norm(b - np.asarray(S32t(jnp.asarray(xf)))) / bn
    rres_r = np.linalg.norm(b - np.asarray(S32t(xr))) / bn
    assert rres_f < 5 * tol
    # same algorithm, same PC -> iteration counts agree to f32 noise
    assert abs(itf - int(itr)) <= 3
    assert np.linalg.norm(xf - np.asarray(xr)) <= 1e-4 * np.linalg.norm(xr)


def test_chunk_boundaries_do_not_change_result():
    """State round-trips between chunked kernel launches must be
    bit-transparent: a chunk size larger than the iteration count and a
    tiny chunk must converge to the same solution."""
    m, tol, maxiter = 33, 1e-6, 500
    alpha, free, B, C, w0, b, _ = _setup(m, seed=3)
    x_big, it_big = _fused(m, alpha, B, C, w0, b, tol, maxiter, chunk=64)
    x_small, it_small = _fused(m, alpha, B, C, w0, b, tol, maxiter,
                               chunk=5)
    assert it_big == it_small
    assert np.allclose(x_big, x_small, rtol=0, atol=0)


def test_maxiter_is_respected():
    m, tol = 33, 1e-30
    alpha, free, B, C, w0, b, _ = _setup(m, seed=1)
    _, its = _fused(m, alpha, B, C, w0, b, tol, maxiter=7, chunk=3)
    assert its <= 7 + 1


def test_pad_roundtrip():
    m = 33
    v = jnp.asarray(np.random.default_rng(0).standard_normal(m * m),
                    f32)
    g = pad_to_grid(v, m)
    assert g.shape == (40, 128)
    assert float(jnp.abs(g[m:, :]).sum()) == 0.0
    assert float(jnp.abs(g[:, m:]).sum()) == 0.0
    assert np.allclose(np.asarray(unpad_from_grid(g, m)), np.asarray(v))


def test_solver_integration_interpret(monkeypatch):
    """P1ObstacleSolver mixed+mg with the fused kernel forced into
    interpret mode reproduces the XLA path's outer/Newton trajectory."""
    monkeypatch.setenv("PGTPU_PALLAS", "force")
    from proximalgalerkin_tpu.mesh import rectangle_mesh
    from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver

    mesh = rectangle_mesh(32, 32, p0=(-1.0, -1.0), p1=(1.0, 1.0))
    kw = dict(alpha_cap=1e2, outer_tol=1e-8, mixed_precision=True,
              pc="mg")
    s_ref = P1ObstacleSolver(mesh, **kw)
    assert s_ref._fused_mg is None or True  # env may force; rebuild below
    monkeypatch.setenv("PGTPU_MGFUSED", "0")
    s_plain = P1ObstacleSolver(mesh, **kw)
    monkeypatch.setenv("PGTPU_MGFUSED", "1")
    s_fused = P1ObstacleSolver(mesh, **kw)
    assert s_fused._fused_mg is not None
    assert s_plain._fused_mg is None

    r_plain = s_plain.solve(max_outer=6)
    r_fused = s_fused.solve(max_outer=6)
    assert r_fused.newton_per_outer == r_plain.newton_per_outer
    assert np.allclose(r_fused.u, r_plain.u, atol=5e-9)
