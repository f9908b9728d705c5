"""Example 02 (Signorini contact) tests: half-disk mesh, trace-space
latent, composite volume+facet assembly."""

import numpy as np
import pytest

from proximalgalerkin_tpu.mesh.parametric import create_half_disk
from proximalgalerkin_tpu.models.signorini import solve_signorini


def test_half_disk_mesh():
    tm = create_half_disk(res=0.05)
    assert len(tm.facets("contact")) > 10
    assert len(tm.facets("displacement")) > 2
    m = tm.mesh
    pts = m.points[m.cell_vertices]
    v1, v2 = pts[:, 1] - pts[:, 0], pts[:, 2] - pts[:, 0]
    area = 0.5 * np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]).sum()
    assert abs(area - np.pi * 0.25 / 2) < 0.01


@pytest.fixture(scope="module")
def solved():
    return solve_signorini(res=0.06, disp=-0.10, verbose=False,
                           max_iterations=20)


def test_converges(solved):
    assert solved.converged
    assert solved.lvpp_iterations <= 20
    assert sum(solved.newton_iterations) < 60


def test_no_penetration(solved):
    """Displaced body must not penetrate the rigid plane y = gap beyond
    the LVPP tolerance."""
    assert solved.penetrations[-1] < 1e-3
    # bottom of disk pushed down but stopped near the plane: vertical
    # displacement bounded below by the initial gap geometry
    assert solved.u[:, 1].min() >= -0.1 - 1e-9


def test_dirichlet_applied(solved):
    # some dofs carry exactly the imposed displacement
    assert np.isclose(solved.u[:, 1].min(), -0.1)


def test_contact_pressure_sign(solved):
    """Latent psi finite and contact active (exp(psi) small where touching)."""
    assert np.isfinite(solved.psi).all()
    assert solved.psi.min() < -1.0  # active contact region exists


def test_half_sphere_mesh_3d():
    from proximalgalerkin_tpu.mesh.parametric import create_half_sphere
    tm = create_half_sphere(res=0.14)
    m = tm.mesh
    assert m.cell_type == "tetrahedron" and m.gdim == 3
    assert len(tm.facets("contact")) > 20
    assert len(tm.facets("displacement")) > 10
    p = m.points[m.cell_vertices]
    vol = np.abs(np.einsum("ij,ij->i",
                           np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
                           p[:, 3] - p[:, 0])).sum() / 6
    assert abs(vol - 2 * np.pi * 0.5**3 / 3) < 0.04


def test_signorini_3d():
    from proximalgalerkin_tpu.mesh.parametric import create_half_sphere
    tm = create_half_sphere(res=0.16)
    res = solve_signorini(tagged=tm, disp=-0.10, gap=0.02, verbose=False,
                          max_iterations=20)
    assert res.converged
    assert res.penetrations[-1] < 5e-3
    assert np.isclose(res.u[:, 2].min(), -0.1)
