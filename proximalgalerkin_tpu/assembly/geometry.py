"""Per-quadrature-point geometry factors.

Replaces the geometry mapping DOLFINx/FFCx generate into C kernels: physical
coordinates, integration weights |det J|·w_q, and the gradient pullback
G = J^{-T} (square) or J(JᵀJ)^{-1} (manifold pseudo-inverse, needed for the
eikonal Möbius example's 2D-in-3D cells, reference eikonal_dolfinx.py:29-58).

Computed once per (mesh, quadrature rule) on host; stored as device arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..elements.lagrange import lagrange_element
from ..mesh.mesh import Mesh


@dataclass(frozen=True)
class CellGeometry:
    x: np.ndarray      # (ncells, nq, gdim) physical quadrature points
    wdet: np.ndarray   # (ncells, nq) weight * |det J| (or sqrt Gram det)
    G: np.ndarray      # (ncells, nq, gdim, tdim) gradient pullback
    affine: bool


def cell_geometry(mesh: Mesh, qpts: np.ndarray, qw: np.ndarray) -> CellGeometry:
    """Compute geometry factors at reference points `qpts` (nq, tdim)."""
    geo_el = lagrange_element(mesh.cell_type, mesh.geom_degree)
    phi, dphi = geo_el.tabulate(qpts)        # (nq, ngeo), (nq, ngeo, tdim)
    coords = mesh.points[mesh.cells]         # (ncells, ngeo, gdim)

    x = np.einsum("qn,cnd->cqd", phi, coords)
    # Jacobian J[c,q,d,t] = d x_d / d xi_t
    J = np.einsum("qnt,cnd->cqdt", dphi, coords)

    gdim, tdim = mesh.gdim, mesh.tdim
    if gdim == tdim == 2:
        # closed-form 2x2 inverse/det: ~4x faster than batched
        # np.linalg.inv at millions of cells
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, d = J[..., 1, 0], J[..., 1, 1]
        detJ = a * d - b * c
        inv_det = 1.0 / detJ
        G = np.empty_like(J)                 # J^{-T}
        G[..., 0, 0] = d * inv_det
        G[..., 0, 1] = -c * inv_det
        G[..., 1, 0] = -b * inv_det
        G[..., 1, 1] = a * inv_det
        wdet = qw[None, :] * np.abs(detJ)
    elif gdim == tdim:
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)              # (c,q,t,d)
        G = np.swapaxes(Jinv, -1, -2)        # J^{-T}: (c,q,d,t)
        wdet = qw[None, :] * np.abs(detJ)
    else:
        # manifold: Gram determinant and pseudo-inverse transpose
        JTJ = np.einsum("cqdt,cqds->cqts", J, J)
        det_g = np.linalg.det(JTJ)
        JTJinv = np.linalg.inv(JTJ)
        G = np.einsum("cqdt,cqts->cqds", J, JTJinv)   # (c,q,gdim,tdim)
        wdet = qw[None, :] * np.sqrt(np.abs(det_g))

    affine = mesh.geom_degree == 1 and mesh.ref_cell.is_simplex
    return CellGeometry(x=x, wdet=wdet, G=G, affine=affine)
