"""Distribution tests on the 8-virtual-device CPU mesh: GSPMD global-view
sharding and explicit shard_map halo exchange both reproduce single-device
results exactly (the multi-device golden tests SURVEY.md §4 calls for)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models import setup_obstacle_problem
from proximalgalerkin_tpu.models.obstacle_fd import fd_obstacle_solve
from proximalgalerkin_tpu.parallel import (device_mesh, replicated,
                                           shard_problem)
from proximalgalerkin_tpu.parallel.halo import fd_obstacle_solve_sharded


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_halo_exchange_matches_single_device():
    u_sh, phi, outer, newton = fd_obstacle_solve_sharded(33)
    ref = fd_obstacle_solve(33)
    assert np.abs(u_sh - ref.u).max() < 1e-12
    assert abs(newton - ref.newton_its) <= 2


def test_gspmd_sharded_residual_matches():
    """Cell-sharded assembly produces identical residuals to unsharded."""
    mesh = rectangle_mesh(16, 16, p0=(-1, -1), p1=(1, 1))
    prob_a = setup_obstacle_problem(mesh, verbose=False)
    pa = prob_a.problem
    x = pa.set_bc(prob_a.space.zeros())
    pa.update(coeffs={"psi_k": x[prob_a.space.slice_of("psi")],
                      "u_k": x[prob_a.space.slice_of("u")]},
              consts={"alpha": jnp.asarray(1.0)})
    F_ref = np.asarray(pa.residual(x))

    prob_b = setup_obstacle_problem(mesh, verbose=False)
    pb = prob_b.problem
    dmesh = device_mesh(8)
    shard_problem(pb, dmesh)
    xb = jax.device_put(x, replicated(dmesh))
    pb.update(coeffs={"psi_k": xb[prob_b.space.slice_of("psi")],
                      "u_k": xb[prob_b.space.slice_of("u")]},
              consts={"alpha": jnp.asarray(1.0)})
    F_sh = np.asarray(pb.residual(xb))
    assert np.abs(F_sh - F_ref).max() < 1e-12
