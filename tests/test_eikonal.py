"""Example 09 (eikonal on Möbius strip) tests: manifold assembly
(gdim=3/tdim=2), div-form mixed system, distance-function oracle."""

import numpy as np
import pytest

from proximalgalerkin_tpu.mesh.manifolds import mobius_strip
from proximalgalerkin_tpu.models.eikonal import solve_eikonal


def test_mobius_mesh():
    m = mobius_strip(24, 4, width=0.4)
    assert m.gdim == 3 and m.tdim == 2
    assert m.num_cells == 24 * 4
    # the strip has a single boundary curve (the Möbius edge);
    # boundary facet count = 2 * ns (both long edges joined by the twist)
    assert len(m.exterior_facets) == 2 * 24


@pytest.fixture(scope="module")
def solved():
    return solve_eikonal(ns=24, nt=4, verbose=False)


def test_converges(solved):
    assert solved.converged
    assert solved.lvpp_iterations < 60
    assert solved.total_newton < 150


def test_distance_function(solved):
    """|grad u| = 1 with u = 0 on the strip edge: the maximum equals the
    distance from edge to centerline = width/2 = 0.2."""
    assert abs(solved.u.max() - 0.2) < 0.02
    assert solved.u.min() > -1e-3


def test_minres_matfree_matches_lu(solved):
    """The device-resident iterative path (MINRES + |diag| Jacobi on the
    matrix-free saddle Jacobian) reproduces the LU solution — parity with
    the reference's MFEM ex40 MINRES solve (ex40.cpp:261-281)."""
    res = solve_eikonal(ns=24, nt=4, verbose=False, solver_options={
        "ksp_type": "minres", "pc_type": "jacobi", "mat_type": "matfree",
        "ksp_rtol": 1e-9, "ksp_max_it": 4000,
        "snes_rtol": 1e-8, "snes_max_it": 50})
    assert res.converged
    assert res.lvpp_iterations == solved.lvpp_iterations
    assert np.abs(np.asarray(res.u) - np.asarray(solved.u)).max() < 1e-6


def test_eikonal_schur_minres_matches_lu_counts():
    """The block-Schur MINRES default (la/schur.py, the ex40.cpp:261-281
    recipe) reproduces the LU path's outer/Newton counts exactly."""
    from proximalgalerkin_tpu.models.eikonal import solve_eikonal
    r_lu = solve_eikonal(ns=16, nt=3, verbose=False)
    r_sc = solve_eikonal(ns=16, nt=3, verbose=False,
                         solver_options={"ksp_type": "minres",
                                         "ksp_rtol": 1e-10,
                                         "ksp_atol": 1e-12,
                                         "ksp_max_it": 3000})
    assert r_sc.converged
    assert r_sc.newton_iterations == r_lu.newton_iterations


def test_star_domain_eikonal():
    """ex40p's planar star-domain variant (reference CI
    test_mfem.yml:31-36): the LVPP eikonal solution approximates the
    distance to the star boundary."""
    import numpy as np
    from proximalgalerkin_tpu.mesh.unstructured import create_star_mesh
    from proximalgalerkin_tpu.models.eikonal import solve_eikonal

    mesh = create_star_mesh(0.12)
    r = solve_eikonal(mesh=mesh, verbose=False)
    u = np.asarray(r.u)
    assert r.lvpp_iterations < 40
    # distance is nonnegative up to the regularized problem's corner
    # overshoot at this resolution (alpha cap 10, tol 1e-5)
    assert u.min() > -0.02
    # the maximum distance-to-boundary of the 5-star (R=1, r=0.45) is
    # attained at the center: the distance from the origin to the edge
    # between an outer and an inner vertex
    a, b = np.array([0.0, 1.0]), 0.45 * np.array(
        [np.cos(np.pi / 2 + np.pi / 5), np.sin(np.pi / 2 + np.pi / 5)])
    t = -np.dot(a, b - a) / np.dot(b - a, b - a)
    d_center = np.linalg.norm(a + t * (b - a))
    assert abs(u.max() - d_center) < 0.1 * d_center


def test_ball_domain_eikonal():
    """ex40p's solid-ball variant (ball-nurbs.mesh leg of the reference
    CI): 3D tet eikonal; the distance at the center approximates R."""
    import numpy as np
    from proximalgalerkin_tpu.mesh.parametric import create_ball_mesh
    from proximalgalerkin_tpu.models.eikonal import solve_eikonal

    mesh = create_ball_mesh(res=0.45)
    r = solve_eikonal(mesh=mesh, verbose=False)
    u = np.asarray(r.u)
    assert r.lvpp_iterations < 40
    assert u.min() > -0.05
    # LVPP eikonal at alpha cap 10 under-resolves the exact distance (the
    # same smoothing the Mobius oracle test allows); just require the
    # center value to be the right scale
    assert 0.5 < u.max() <= 1.05
