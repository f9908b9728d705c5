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
