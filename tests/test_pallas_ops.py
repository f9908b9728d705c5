"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver
from proximalgalerkin_tpu.ops import dia_spmv_pallas


def test_dia_spmv_pallas_matches_xla():
    mesh = rectangle_mesh(24, 24, p0=(-1, -1), p1=(1, 1))
    s = P1ObstacleSolver(mesh)
    assert s.dia is not None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=s.N))
    y_ref = s.dia.spmv(x)
    y_pl = dia_spmv_pallas(s.dia.offsets, s.dia.data, x, block=256,
                           interpret=True)
    assert float(jnp.abs(y_ref - y_pl).max()) < 1e-12


def test_dia_spmv_pallas_f32_blocks():
    """Non-divisible sizes and multiple blocks."""
    mesh = rectangle_mesh(17, 13, p0=(-1, -1), p1=(1, 1))
    s = P1ObstacleSolver(mesh)
    x = jnp.asarray(np.random.default_rng(1).normal(size=s.N),
                    jnp.float32)
    d32 = s.dia.data.astype(jnp.float32)
    y_ref = s.dia.spmv(x, d32)
    y_pl = dia_spmv_pallas(s.dia.offsets, d32, x, block=64, interpret=True)
    assert float(jnp.abs(y_ref - y_pl).max()) < 1e-4


def test_fused_dia_cg_interpret_matches_dense():
    """Fused two-kernel Pallas CG (ops/pallas_cg.py) vs a dense solve on
    a random SPD 7-diagonal DIA system — interpret mode (CPU CI); the
    compiled path is exercised on TPU by bench.py."""
    import numpy as np
    import jax.numpy as jnp
    from proximalgalerkin_tpu.ops.pallas_cg import make_fused_dia_cg

    rng = np.random.default_rng(0)
    n, nx = 800, 25
    offsets = (-nx - 1, -nx, -1, 0, 1, nx, nx + 1)
    sym = {off: k for k, off in enumerate(offsets)}
    data = np.zeros((7, n))
    for k, off in enumerate(offsets):
        if off > 0:
            vals = -rng.random(n) * 0.5
            vals[n - off:] = 0.0
            data[k] = vals
            data[sym[-off]][off:] = vals[:n - off]
    data[sym[0]] = 4.0 + np.abs(data).sum(axis=0)

    def spmv(x):
        y = np.zeros(n)
        for k, off in enumerate(offsets):
            if off >= 0:
                y[:n - off] += data[k][:n - off] * x[off:]
            else:
                y[-off:] += data[k][-off:] * x[:off]
        return y

    A = np.column_stack([spmv(np.eye(n)[:, i]) for i in range(n)])
    assert np.allclose(A, A.T)
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(A, b)

    fused = make_fused_dia_cg(offsets, n, dtype=jnp.float64, interpret=True)
    x, its = fused(jnp.asarray(data), jnp.asarray(b), 1e-12, 500)
    err = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err
    assert 0 < int(its) < 100
