"""Unit tests for quadrature rules, orthonormal bases, and Lagrange elements."""

import numpy as np
import pytest

from proximalgalerkin_tpu.elements import (
    cell_quadrature, lagrange_element, num_modes, reference_cell,
    tabulate_orthonormal,
)

CELLS_2D = ["triangle", "quadrilateral"]
ALL_CELLS = ["interval", "triangle", "quadrilateral", "tetrahedron", "hexahedron"]


@pytest.mark.parametrize("cell", ALL_CELLS)
@pytest.mark.parametrize("degree", [1, 2, 3, 5, 8, 13, 20])
def test_quadrature_exactness(cell, degree):
    """Rule of requested degree integrates monomials of that degree exactly."""
    ref = reference_cell(cell)
    pts, w = cell_quadrature(cell, degree)
    assert np.isclose(w.sum(), ref.volume)
    rng = np.random.default_rng(0)
    d = ref.dim
    for _ in range(5):
        # random monomial with total degree <= requested
        exps = rng.multinomial(degree, np.ones(d) / d)
        if not ref.is_simplex:
            exps = np.minimum(exps, degree)
        vals = np.prod(pts ** exps[None, :], axis=1)
        quad = float(w @ vals)
        exact = _exact_monomial(cell, exps)
        assert np.isclose(quad, exact, rtol=1e-12, atol=1e-14), (exps, quad, exact)


def _exact_monomial(cell, exps):
    """Exact integral of prod x_i^e_i over the reference cell."""
    from math import factorial, prod
    if cell in ("interval", "quadrilateral", "hexahedron"):
        return prod(1.0 / (e + 1) for e in exps)
    if cell == "triangle":
        a, b = int(exps[0]), int(exps[1])
        return factorial(a) * factorial(b) / factorial(a + b + 2)
    if cell == "tetrahedron":
        a, b, c = map(int, exps)
        return factorial(a) * factorial(b) * factorial(c) / factorial(a + b + c + 3)
    raise ValueError(cell)


@pytest.mark.parametrize("cell", ALL_CELLS)
@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_orthonormal_basis(cell, degree):
    """Mass matrix of the modal basis under quadrature is the identity,
    and gradients match finite differences."""
    qdeg = 2 * degree + 2
    pts, w = cell_quadrature(cell, qdeg)
    vals, grads = tabulate_orthonormal(cell, degree, pts)
    M = np.einsum("mq,nq,q->mn", vals, vals, w)
    scale = 1.0 if cell in ("interval", "quadrilateral", "hexahedron") else 1.0
    assert np.allclose(M, scale * np.eye(len(vals)), atol=1e-10), M

    # FD gradient check at interior points
    ref = reference_cell(cell)
    bary = ref.vertices.mean(axis=0)
    probe = 0.5 * (pts[: min(6, len(pts))] + bary)  # pull strictly inside
    _, g = tabulate_orthonormal(cell, degree, probe)
    h = 1e-6
    for d in range(ref.dim):
        pp, pm = probe.copy(), probe.copy()
        pp[:, d] += h
        pm[:, d] -= h
        vp, _ = tabulate_orthonormal(cell, degree, pp)
        vm, _ = tabulate_orthonormal(cell, degree, pm)
        fd = (vp - vm) / (2 * h)
        assert np.allclose(g[:, :, d], fd, atol=1e-5), (cell, degree, d)


@pytest.mark.parametrize("cell", ALL_CELLS)
@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_lagrange_delta_and_unity(cell, degree):
    el = lagrange_element(cell, degree)
    assert el.ndof == num_modes(cell, degree)
    vals, grads = el.tabulate(el.points)
    assert np.allclose(vals, np.eye(el.ndof), atol=1e-9)
    # partition of unity + gradients sum to zero at random points
    rng = np.random.default_rng(1)
    ref = reference_cell(cell)
    w = rng.dirichlet(np.ones(ref.num_vertices), size=20)
    pts = w @ ref.vertices
    v, g = el.tabulate(pts)
    assert np.allclose(v.sum(axis=1), 1.0, atol=1e-10)
    assert np.allclose(g.sum(axis=1), 0.0, atol=1e-9)


@pytest.mark.parametrize("cell", CELLS_2D)
@pytest.mark.parametrize("degree", [1, 2, 3])
def test_lagrange_reproduces_polynomials(cell, degree):
    """Interpolating a polynomial of the element's degree is exact."""
    el = lagrange_element(cell, degree)
    rng = np.random.default_rng(2)
    ref = reference_cell(cell)
    w = rng.dirichlet(np.ones(ref.num_vertices), size=30)
    pts = w @ ref.vertices

    def f(x):
        return (1.0 + x[:, 0] + x[:, 1]) ** degree

    coeffs = f(el.points)
    v, g = el.tabulate(pts)
    assert np.allclose(v @ coeffs, f(pts), atol=1e-9)
    # gradient check
    gx = degree * (1.0 + pts[:, 0] + pts[:, 1]) ** (degree - 1)
    assert np.allclose(g[:, :, 0] @ coeffs, gx, atol=1e-8)
    assert np.allclose(g[:, :, 1] @ coeffs, gx, atol=1e-8)


def test_dg0():
    el = lagrange_element("triangle", 0)
    assert el.ndof == 1
    assert el.discontinuous
    v, g = el.tabulate(np.array([[0.3, 0.3]]))
    assert np.allclose(v, 1.0)
    assert np.allclose(g, 0.0)


@pytest.mark.parametrize("degree", [8, 12, 14])
def test_high_degree_interval_gll(degree):
    """High-degree 1D elements need GLL nodes for conditioning (Monge–Ampère
    p-sweep goes to 14, reference monge_ampere_dolfinx.py:31)."""
    el = lagrange_element("interval", degree, variant="gll")
    vals, _ = el.tabulate(el.points)
    assert np.allclose(vals, np.eye(el.ndof), atol=1e-8)


def test_facet_dofs_triangle_p2():
    el = lagrange_element("triangle", 2)
    # facet 2 is edge (0,1): vertex dofs 0,1 and its edge-interior dof
    fd = el.facet_dofs(2)
    assert 0 in fd and 1 in fd and len(fd) == 3
