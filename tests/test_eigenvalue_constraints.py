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


def test_checkpoint_resume_matches_uninterrupted(tmp_path, solved):
    """A run interrupted after 2 LVPP iterations and resumed from its
    checkpoint must reach the same solution and the same total outer/
    Newton counts as the uninterrupted run (records/ resumability)."""
    from proximalgalerkin_tpu.core.reasons import NotConvergedError

    ck = str(tmp_path / "ck.npz")
    kw = dict(N=10, degree=2, quadrature_degree=8, tol=1e-8, verbose=False,
              checkpoint_path=ck)
    try:
        solve_eigenvalue_constraints(max_lvpp=2, **kw)
    except (RuntimeError, NotConvergedError):
        pass  # interrupted: 2 iterations are not enough to converge
    r = solve_eigenvalue_constraints(**kw)
    assert r.lvpp.converged
    assert r.lvpp.iterations == solved.lvpp.iterations
    assert r.lvpp.total_newton == solved.lvpp.total_newton
    assert np.allclose(r.q1, solved.q1, atol=1e-8)
