"""Example 05 (thermoforming QVI) tests."""

import numpy as np
import pytest

from proximalgalerkin_tpu.models.thermoforming import solve_thermoforming


@pytest.fixture(scope="module")
def solved():
    return solve_thermoforming(M=24, verbose=False, termination_tol=1e-7)


def test_converges(solved):
    assert solved.converged
    assert solved.lvpp_iterations < 30
    assert 10 < solved.total_newton < 150


def test_membrane_below_mould(solved):
    """u <= Phi0 + xi*T up to weak-enforcement error."""
    viol = float((solved.u - solved.mould).max())
    assert viol < 0.02


def test_temperature_physical(solved):
    assert 0.0 < solved.T.min() and solved.T.max() < 25.0


def test_contact_occurs(solved):
    """At the QVI solution the membrane touches the deformed mould
    somewhere (within tolerance)."""
    gap = solved.mould - solved.u
    assert float(gap.min()) < 0.02
