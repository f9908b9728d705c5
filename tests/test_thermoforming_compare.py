"""QVI solver comparison (reference solver_comparison suite): the three
baselines agree with each other, and LVPP needs far fewer linear solves —
the paper's headline comparison (BASELINE.md thermoforming row)."""

import numpy as np
import pytest

from proximalgalerkin_tpu.models.thermoforming import solve_thermoforming
from proximalgalerkin_tpu.models.thermoforming_compare import (
    fixed_point_solve, moreau_yosida_solve, semismooth_active_set_solve)

M = 20


@pytest.fixture(scope="module")
def runs():
    lv = solve_thermoforming(M=M, verbose=False, termination_tol=1e-7)
    fp = fixed_point_solve(M=M, verbose=False)
    my = moreau_yosida_solve(M=M, verbose=False, max_outer=15)
    ss = semismooth_active_set_solve(M=M, verbose=False)
    return lv, fp, my, ss


def test_baselines_agree(runs):
    lv, fp, my, ss = runs
    assert fp.converged
    assert np.abs(my.u - fp.u).max() < 0.05
    assert np.abs(ss.u - fp.u).max() < 0.05


def test_lvpp_fewest_solves(runs):
    lv, fp, my, ss = runs
    assert lv.total_newton < fp.linear_solves
    assert lv.total_newton < my.linear_solves
