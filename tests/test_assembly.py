"""End-to-end validation of mesh → dofmap → assembly → solve on Poisson."""

import numpy as np
import pytest

import jax.numpy as jnp

from proximalgalerkin_tpu.mesh import unit_square_mesh, unit_cube_mesh
from proximalgalerkin_tpu.spaces import FunctionSpace, MixedSpace, DirichletBC
from proximalgalerkin_tpu.assembly import VolumeForm
from proximalgalerkin_tpu.solve import NonlinearProblem, NewtonSolver
from proximalgalerkin_tpu.core import SolverOptions
from proximalgalerkin_tpu.elements import lagrange_element


def test_mesh_topology():
    mesh = unit_square_mesh(4, 4)
    assert mesh.num_cells == 32
    assert mesh.points.shape == (25, 2)
    # 2*nx*ny quads split in 2 -> Euler: V - E + F = 1 for disk
    nfacets = mesh.num_facets
    assert len(mesh.exterior_facets) == 16
    assert 25 - nfacets + 32 == 1
    left = mesh.locate_entities_boundary(lambda x: np.isclose(x[0], 0.0))
    assert len(left) == 4


@pytest.mark.parametrize("diag", ["right", "left", "crossed"])
def test_mesh_diagonals(diag):
    mesh = unit_square_mesh(3, 3, diagonal=diag)
    areas = []
    pts = mesh.points[mesh.cell_vertices]
    v1 = pts[:, 1] - pts[:, 0]
    v2 = pts[:, 2] - pts[:, 0]
    area = 0.5 * np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
    assert np.isclose(area.sum(), 1.0)


@pytest.mark.parametrize("cell,degree", [
    ("triangle", 2), ("triangle", 3), ("triangle", 4),
    ("quadrilateral", 2), ("quadrilateral", 3),
    ("tetrahedron", 2), ("hexahedron", 2),
])
def test_dofmap_continuity(cell, degree):
    """Physical dof points computed from each adjacent cell must agree —
    verifies edge/facet orientation handling at any degree."""
    if cell in ("triangle", "quadrilateral"):
        mesh = unit_square_mesh(3, 3, cell_type=cell)
    else:
        mesh = unit_cube_mesh(2, 2, 2, cell_type=cell)
    fs = FunctionSpace.create(mesh, degree)
    el = fs.element
    geo = lagrange_element(mesh.cell_type, 1)
    phi, _ = geo.tabulate(el.points)
    xcell = np.einsum("ng,cgd->cnd", phi, mesh.points[mesh.cells])
    # for every global dof, all (cell, local) occurrences must give same point
    seen = {}
    dm = fs.dofmap
    for c in range(mesh.num_cells):
        for i in range(el.ndof):
            g = dm[c, i]
            p = tuple(np.round(xcell[c, i], 10))
            if g in seen:
                assert seen[g] == p, (cell, degree, g, seen[g], p)
            else:
                seen[g] = p
    assert len(seen) == fs.num_scalar_dofs


def _poisson_error(n, degree, cell="triangle"):
    """Solve -Δu = f, u = u_exact on boundary; return L2 error."""
    mesh = unit_square_mesh(n, n, cell_type=cell)
    fs = FunctionSpace.create(mesh, degree)
    space = MixedSpace([("u", fs)])

    def u_exact(x):
        return np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])

    def residual(x, u, gu, c, gc, consts):
        f = 2.0 * jnp.pi**2 * jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
        return {"u": (-f, gu["u"])}

    form = VolumeForm(space, residual, quadrature_degree=2 * degree + 2)
    bc = DirichletBC.from_marker("u", fs, value=0.0)
    prob = NonlinearProblem(form, [bc])
    opts = SolverOptions({"snes_max_it": 5, "snes_rtol": 1e-12,
                          "ksp_type": "preonly", "pc_type": "lu"})
    res = NewtonSolver(prob, opts).solve(space.zeros())
    assert res.converged, res.reason

    err_fn = form.make_functional(
        lambda x, u, gu, c, gc, k:
        (u["u"] - jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])) ** 2)
    return float(np.sqrt(err_fn(res.x)))


@pytest.mark.parametrize("degree,expected_order", [(1, 2.0), (2, 3.0), (3, 4.0)])
def test_poisson_convergence(degree, expected_order):
    e1 = _poisson_error(4, degree)
    e2 = _poisson_error(8, degree)
    order = np.log2(e1 / e2)
    assert order > expected_order - 0.25, (degree, e1, e2, order)


def test_poisson_quads():
    e1 = _poisson_error(4, 2, cell="quadrilateral")
    e2 = _poisson_error(8, 2, cell="quadrilateral")
    assert np.log2(e1 / e2) > 2.7


def test_matrix_free_matches_assembled():
    """jvp-based Jacobian action == assembled matrix action (nonlinear form)."""
    mesh = unit_square_mesh(4, 4)
    fs = FunctionSpace.create(mesh, 1)
    space = MixedSpace([("u", fs), ("psi", fs)])

    def residual(x, u, gu, c, gc, consts):
        al = consts["alpha"]
        return {"u": (u["psi"], al * gu["u"]),
                "psi": (u["u"] - jnp.exp(u["psi"]), None)}

    form = VolumeForm(space, residual, quadrature_degree=4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=space.num_dofs) * 0.1)
    v = jnp.asarray(rng.normal(size=space.num_dofs))
    consts = {"alpha": jnp.asarray(2.5)}
    Av_free = form.jacobian_action(x, v, {}, consts)
    A = form.assemble_scipy(x, {}, consts)
    Av_mat = A @ np.asarray(v)
    assert np.allclose(np.asarray(Av_free), Av_mat, atol=1e-10)
    # diagonal extraction
    d = form.jacobian_diagonal(x, {}, consts)
    assert np.allclose(np.asarray(d), A.diagonal(), atol=1e-10)


def test_krylov_matches_lu():
    mesh = unit_square_mesh(6, 6)
    fs = FunctionSpace.create(mesh, 1)
    space = MixedSpace([("u", fs)])

    def residual(x, u, gu, c, gc, consts):
        return {"u": (-1.0 + u["u"], gu["u"])}  # -Δu + u = 1

    form = VolumeForm(space, residual, quadrature_degree=3)
    bc = DirichletBC.from_marker("u", fs, value=0.0)
    x_lu = NewtonSolver(NonlinearProblem(form, [bc]), SolverOptions(
        {"ksp_type": "preonly", "pc_type": "lu", "snes_rtol": 1e-12}
    )).solve(space.zeros()).x
    x_cg = NewtonSolver(NonlinearProblem(form, [bc]), SolverOptions(
        {"ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12,
         "snes_rtol": 1e-12}
    )).solve(space.zeros()).x
    x_mr = NewtonSolver(NonlinearProblem(form, [bc]), SolverOptions(
        {"ksp_type": "minres", "pc_type": "jacobi", "ksp_rtol": 1e-12,
         "snes_rtol": 1e-12}
    )).solve(space.zeros()).x
    assert np.allclose(np.asarray(x_lu), np.asarray(x_cg), atol=1e-8)
    assert np.allclose(np.asarray(x_lu), np.asarray(x_mr), atol=1e-7)


def test_interpolation_and_functional():
    mesh = unit_square_mesh(8, 8)
    fs = FunctionSpace.create(mesh, 2)
    space = MixedSpace([("u", fs)])
    form = VolumeForm(space, lambda *a: {"u": (0.0, None)}, quadrature_degree=4)
    z = fs.interpolate(lambda x: x[0] ** 2 + x[1])
    integral = form.make_functional(lambda x, u, gu, c, gc, k: u["u"])(
        jnp.asarray(z))
    assert np.isclose(float(integral), 1.0 / 3.0 + 0.5, atol=1e-12)


def test_quadratic_geometry_disk():
    """Isoparametric (order-2) geometry: curved-boundary disk area is
    accurate to O(h^4) instead of O(h^2)."""
    from proximalgalerkin_tpu.mesh.unstructured import (
        create_disk_mesh, create_disk_mesh_quadratic)
    form_area = lambda mesh: float(VolumeForm(
        MixedSpace([("u", FunctionSpace.create(mesh, 1))]),
        lambda x, u, gu, c, gc, k: {"u": (0.0, None)}, 4
    ).make_functional(lambda x, u, gu, c, gc, k: 1.0)(
        np.zeros(FunctionSpace.create(mesh, 1).num_dofs)))
    err_lin = abs(form_area(create_disk_mesh(0.15)) - np.pi)
    err_quad = abs(form_area(create_disk_mesh_quadratic(0.15)) - np.pi)
    assert err_quad < err_lin / 100


def test_element_matrices_chunked_matches_unchunked(monkeypatch):
    """Chunked (lax.map) element-matrix assembly is exact: same matrices
    as the single-block path, including the tail block and raw
    quadrature-point coefficients."""
    import jax.numpy as jnp
    from proximalgalerkin_tpu.assembly.assemble import VolumeForm
    from proximalgalerkin_tpu.mesh import rectangle_mesh
    from proximalgalerkin_tpu.spaces import FunctionSpace, MixedSpace

    mesh = rectangle_mesh(7, 5)     # 70 cells: 2 full chunks of 32 + tail
    V = FunctionSpace.create(mesh, 1)
    space = MixedSpace([("u", V), ("psi", V)])

    def residual(x, u, gu, c, gc, consts):
        return {"u": (u["psi"] - c["q"], consts["a"] * gu["u"]),
                "psi": (u["u"] - jnp.exp(u["psi"]), None)}

    form = VolumeForm(space, residual, 3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(space.num_dofs))
    coeffs = {"q": jnp.asarray(rng.standard_normal(
        (mesh.num_cells, form.nq)))}
    consts = {"a": jnp.asarray(2.5)}

    ref = np.asarray(form.element_matrices(x, coeffs, consts))
    ref_F = np.asarray(form.residual(x, coeffs, consts))
    ref_d = np.asarray(form.jacobian_diagonal(x, coeffs, consts))
    monkeypatch.setattr(VolumeForm, "ELEMENT_MATRIX_CHUNK", 32)
    monkeypatch.setattr(VolumeForm, "RESIDUAL_CHUNK", 32)
    form2 = VolumeForm(space, residual, 3)
    chunked = np.asarray(form2.element_matrices(x, coeffs, consts))
    assert np.abs(chunked - ref).max() < 1e-14
    F2 = np.asarray(form2.residual(x, coeffs, consts))
    assert np.abs(F2 - ref_F).max() < 1e-13
    d2 = np.asarray(form2.jacobian_diagonal(x, coeffs, consts))
    assert np.abs(d2 - ref_d).max() < 1e-13


def test_ell_pattern_disk_cache():
    """EllPattern.build round-trips through the content-addressed disk
    cache: a second build with identical inputs loads the cached arrays
    bit-exactly, and different inputs miss (fresh build, not a stale hit)."""
    from proximalgalerkin_tpu.la import ell as ell_mod

    rng = np.random.default_rng(0)
    gi = rng.integers(0, 200, size=(120, 6))
    bc = np.array([0, 5, 7])
    p1 = ell_mod.EllPattern.build(gi, 200, bc)
    p2 = ell_mod.EllPattern.build(gi, 200, bc)
    for name in ("slot_map", "keep", "diag_ones", "ell_gather", "ell_cols"):
        assert np.array_equal(getattr(p1, name), getattr(p2, name)), name
    assert (p1.nnz, p1.width, p1.num_dofs) == (p2.nnz, p2.width, p2.num_dofs)

    # different bc set must change keep/diag_ones (cache keyed on bc too)
    p3 = ell_mod.EllPattern.build(gi, 200, np.array([0, 5]))
    assert not np.array_equal(p1.keep, p3.keep) or not np.array_equal(
        p1.diag_ones, p3.diag_ones)
