"""Checkpoint/resume: interrupted LVPP solve resumes to the same answer."""

import numpy as np
import pytest

from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models import setup_obstacle_problem
from proximalgalerkin_tpu.utils.checkpoint import LVPPCheckpoint


def test_checkpoint_resume(tmp_path):
    mesh = rectangle_mesh(10, 10, p0=(-1.0, -1.0), p1=(1.0, 1.0))
    ckpt = tmp_path / "state.npz"

    # full run for reference
    prob_full = setup_obstacle_problem(mesh, alpha_max=1e2, tol_exit=1e-6,
                                       verbose=False)
    res_full = prob_full.solve()
    assert res_full.converged

    # interrupted run: stop after 3 outer iterations (max_iterations=3)
    prob_a = setup_obstacle_problem(mesh, alpha_max=1e2, tol_exit=1e-6,
                                    maximum_number_of_outer_loop_iterations=3,
                                    verbose=False)
    prob_a.solver.checkpoint_path = str(ckpt)
    res_a = prob_a.solve()
    assert not res_a.converged and res_a.iterations == 3
    assert ckpt.exists()

    # resume
    state = LVPPCheckpoint.load(ckpt)
    assert state.iteration == 3
    prob_b = setup_obstacle_problem(mesh, alpha_max=1e2, tol_exit=1e-6,
                                    verbose=False)
    res_b = prob_b.solver.solve(prob_b.space.zeros(), resume=state)
    assert res_b.converged
    # resumed run reaches the same solution and records the full history
    assert np.allclose(np.asarray(res_b.x), np.asarray(res_full.x),
                       atol=1e-8)
    assert res_b.iterations == res_full.iterations
