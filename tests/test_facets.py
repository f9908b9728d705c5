"""Facet (ds) assembly tests: surface measures, normals, boundary
functionals against analytic values."""

import numpy as np
import jax.numpy as jnp
import pytest

from proximalgalerkin_tpu.assembly.facets import FacetForm
from proximalgalerkin_tpu.mesh import unit_square_mesh, unit_cube_mesh
from proximalgalerkin_tpu.spaces import FunctionSpace, MixedSpace


def test_boundary_measure_square():
    mesh = unit_square_mesh(5, 5)
    V = FunctionSpace.create(mesh, 1)
    space = MixedSpace([("u", V)])
    ff = FacetForm(space, mesh.exterior_facets,
                   lambda x, u, gu, c, gc, n, k: {}, 2)
    one = ff.make_functional(lambda x, u, gu, c, gc, n, k: 1.0)
    assert np.isclose(float(one(space.zeros())), 4.0)


def test_boundary_measure_cube():
    mesh = unit_cube_mesh(2, 2, 2)
    V = FunctionSpace.create(mesh, 1)
    space = MixedSpace([("u", V)])
    ff = FacetForm(space, mesh.exterior_facets,
                   lambda x, u, gu, c, gc, n, k: {}, 2)
    one = ff.make_functional(lambda x, u, gu, c, gc, n, k: 1.0)
    assert np.isclose(float(one(space.zeros())), 6.0)


def test_divergence_theorem():
    """∫_Ω div(F) dx = ∫_∂Ω F·n ds for F = (x^2, xy): checks normals and
    surface measures jointly."""
    mesh = unit_square_mesh(6, 6)
    V = FunctionSpace.create(mesh, 2)
    space = MixedSpace([("u", V)])
    ff = FacetForm(space, mesh.exterior_facets,
                   lambda x, u, gu, c, gc, n, k: {}, 6)
    flux = ff.make_functional(
        lambda x, u, gu, c, gc, n, k:
        x[0] ** 2 * n[0] + x[0] * x[1] * n[1])
    # div F = 2x + x = 3x, ∫ = 3/2
    assert np.isclose(float(flux(space.zeros())), 1.5, atol=1e-12)


def test_facet_residual_assembles_boundary_mass():
    """F(v) = ∫ u v ds with u = 1 gives the boundary 'mass' vector whose
    sum is the perimeter."""
    mesh = unit_square_mesh(4, 4)
    V = FunctionSpace.create(mesh, 1)
    space = MixedSpace([("u", V)])
    ff = FacetForm(space, mesh.exterior_facets,
                   lambda x, u, gu, c, gc, n, k: {"u": u["u"]}, 4)
    z = jnp.ones(space.num_dofs)
    F = ff.residual(z)
    assert np.isclose(float(jnp.sum(F)), 4.0)
    # interior dofs receive nothing
    bdofs = set(np.asarray(V.boundary_dofs()).tolist())
    inner = [i for i in range(V.num_dofs) if i not in bdofs]
    assert np.allclose(np.asarray(F)[inner], 0.0)


def test_facet_gradient_tangential():
    """Boundary functional using grad(u): ∫_∂Ω du/dn for u = x^2 + y^2 on
    the unit square equals ∫ Δu dx = 4."""
    mesh = unit_square_mesh(5, 5)
    V = FunctionSpace.create(mesh, 2)
    space = MixedSpace([("u", V)])
    z = jnp.asarray(V.interpolate(lambda x: x[0] ** 2 + x[1] ** 2))
    ff = FacetForm(space, mesh.exterior_facets,
                   lambda x, u, gu, c, gc, n, k: {}, 6)
    dn = ff.make_functional(
        lambda x, u, gu, c, gc, n, k: jnp.dot(gu["u"], n))
    assert np.isclose(float(dn(z)), 4.0, atol=1e-10)
