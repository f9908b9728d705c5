"""Example 07 (eigenvalue constraints) tests."""

import numpy as np
import pytest

from proximalgalerkin_tpu.models.eigenvalue_constraints import (
    solve_eigenvalue_constraints)


@pytest.fixture(scope="module")
def solved():
    return solve_eigenvalue_constraints(
        N=10, degree=2, quadrature_degree=8, tol=1e-8, verbose=False)


def test_converges(solved):
    assert solved.lvpp.converged
    assert solved.lvpp.iterations < 40
    assert solved.lvpp.total_newton < 150


def test_eigenvalues_bounded(solved):
    """The tanh latent map enforces |lambda(Q)| <= 1/2 exactly at dofs."""
    lo, hi = solved.eigenvalue_range()
    assert hi <= 0.5 + 1e-8
    assert lo >= -0.5 - 1e-8
    # boundary data saturates the bound
    assert hi > 0.45
