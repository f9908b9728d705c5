"""Example 08 (intersecting constraints) tests: simultaneous obstacle and
gradient bounds with continuation + adaptive retry."""

import numpy as np
import pytest

from proximalgalerkin_tpu.models.intersecting import (
    smooth_bump, solve_intersecting)


@pytest.fixture(scope="module")
def solved():
    return solve_intersecting(n_cells=201, phis=(3.0, 1.0, 0.1),
                              verbose=False)


def test_continuation_converges(solved):
    assert all(solved.converged)
    assert all(1 <= n <= 60 for n in solved.lvpp_iterations)


def test_obstacle_respected(solved):
    xs = np.linspace(0, 1, 202)
    assert float((solved.u - smooth_bump(xs)).min()) > -1e-3


def test_gradient_bound_respected(solved):
    xs = np.linspace(0, 1, 202)
    h = xs[1] - xs[0]
    du = np.diff(solved.u) / h
    mask = (xs[:-1] < 0.19) | (xs[:-1] > 0.81)
    # final bound 0.1 outside the unconstrained window
    assert float(np.abs(du[mask]).max()) < 0.105


def test_tighter_bound_flattens(solved):
    """With the 0.1 bound the solution must be pinned well below the
    unconstrained obstacle peak near the boundary."""
    xs = np.linspace(0, 1, 202)
    at_02 = solved.u[np.argmin(np.abs(xs - 0.2))]
    assert at_02 < 0.25 * smooth_bump(np.array([0.5]))[0] + 0.05
