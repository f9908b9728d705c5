"""Example 10 (Monge–Ampère) tests: manufactured-solution accuracy and
p-refinement behavior (reference monge_ampere_dolfinx.py:31,161-176)."""

import numpy as np
import pytest

from proximalgalerkin_tpu.models.monge_ampere import (
    p_refinement_sweep, solve_monge_ampere_degree)


@pytest.fixture(scope="module")
def sweep():
    return p_refinement_sweep(3, 5, verbose=False)


def test_errors_decrease_exponentially(sweep):
    e = sweep.errors
    assert e[0] < 0.1
    # each degree gains at least ~4x accuracy (spectral convergence)
    assert all(e[i + 1] < e[i] / 4 for i in range(len(e) - 1)), e


def test_warm_start_reduces_newton(sweep):
    # warm-started solves need no more Newton steps than the first
    assert sweep.newton_its[-1] <= sweep.newton_its[0]
    assert all(n <= 15 for n in sweep.newton_its)


def test_convexity_of_solution():
    """The latent map guarantees an SPD discrete Hessian: check
    tr(psi) finite and expm(psi) positive definite at dofs."""
    space, x, its, err, mesh = solve_monge_ampere_degree(4, verbose=False)
    Psi = np.asarray(x[space.slice_of("Psi")]).reshape(-1, 3)
    # packed sym 2x2 exp(psi) is SPD by construction; check psi is finite
    # and the resulting Hessian determinant is positive
    assert np.isfinite(Psi).all()
    dets = np.exp(Psi[:, 0] + Psi[:, 2])  # det expm(psi) = exp(tr psi)
    assert (dets > 0).all()
