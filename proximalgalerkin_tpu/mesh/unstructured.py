"""Self-contained 2D unstructured meshing (gmsh/netgen replacement).

Generates the parametric geometries the reference obtains from external
meshers: the unit disk of example 01 (gmsh, generate_mesh_gmsh.py:12-43),
the cracked plate with hole of example 03 (netgen CSG2d,
examples/03_fracture/generate_mesh.py:15-55), and uniform refinement
(the Firedrake MeshHierarchy, fracture_firedrake.py:39).

Method: sample boundary curves at the target resolution, fill the interior
with a hex-lattice point cloud, Delaunay-triangulate (scipy/qhull), filter
triangles by centroid membership, and Lloyd-smooth interior points. Facet
tags are assigned by nearest named boundary feature.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np
from scipy.spatial import Delaunay, cKDTree

from .mesh import Mesh


def _sample_segment(p0, p1, h: float, include_start=True) -> np.ndarray:
    p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
    L = np.linalg.norm(p1 - p0)
    n = max(int(np.ceil(L / h)), 1)
    t = np.linspace(0.0, 1.0, n + 1)
    pts = p0[None, :] + t[:, None] * (p1 - p0)[None, :]
    return pts if include_start else pts[1:]


def _point_in_polygon(pts: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized ray casting; poly (m, 2) closed implicitly."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), dtype=bool)
    m = len(poly)
    j = m - 1
    for i in range(m):
        xi, yi = poly[i]
        xj, yj = poly[j]
        cond = ((yi > y) != (yj > y)) & (
            x < (xj - xi) * (y - yi) / (yj - yi + 1e-300) + xi)
        inside ^= cond
        j = i
    return inside


def _hex_lattice(bbox, h: float) -> np.ndarray:
    (x0, y0), (x1, y1) = bbox
    dy = h * np.sqrt(3) / 2
    rows = []
    y = y0
    row = 0
    while y <= y1 + 1e-12:
        xs = np.arange(x0 + (h / 2 if row % 2 else 0.0), x1 + 1e-12, h)
        rows.append(np.stack([xs, np.full_like(xs, y)], axis=1))
        y += dy
        row += 1
    return np.concatenate(rows, axis=0)


@dataclass
class TaggedMesh:
    mesh: Mesh
    facet_tags: Dict[int, str]      # facet index -> region name
    regions: Dict[str, List[int]]   # region name -> facet indices

    def facets(self, name: str) -> np.ndarray:
        return np.asarray(self.regions.get(name, []), dtype=np.int32)


def _build(points: np.ndarray, inside_fn, boundary_tree: cKDTree,
           h: float, smooth: int = 2) -> np.ndarray:
    """Delaunay + filter + Lloyd smoothing; returns (points, cells)."""

    def triangulate(pts):
        tri = Delaunay(pts)
        cells = tri.simplices
        cent = pts[cells].mean(axis=1)
        keep = inside_fn(cent)
        # also drop slivers hugging the boundary
        return cells[keep]

    pts = points
    nb = boundary_tree.n
    for _ in range(smooth + 1):
        cells = triangulate(pts)
        if smooth == 0:
            break
        # Laplacian smoothing of interior (non-boundary-sample) points
        neigh = {}
        for c in cells:
            for a in range(3):
                for b in range(3):
                    if a != b:
                        neigh.setdefault(c[a], set()).add(c[b])
        new = pts.copy()
        for i, ns in neigh.items():
            if i >= nb:  # boundary samples are the first nb points
                new[i] = pts[list(ns)].mean(axis=0)
        pts = new
        smooth -= 1
    cells = triangulate(pts)
    # drop unused points, remap
    used = np.unique(cells)
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return pts[used], remap[cells]


def _tag_boundary(mesh: Mesh, features: Sequence[Tuple[str, Callable]]
                  ) -> TaggedMesh:
    """Classify each exterior facet by the first feature whose distance
    function is minimal at the facet midpoint."""
    ext = mesh.exterior_facets
    mids = mesh.midpoints(mesh.tdim - 1, ext)
    names = [n for n, _ in features]
    dists = np.stack([f(mids) for _, f in features], axis=1)
    pick = np.argmin(dists, axis=1)
    facet_tags: Dict[int, str] = {}
    regions: Dict[str, List[int]] = {n: [] for n in names}
    for f, p in zip(ext, pick):
        facet_tags[int(f)] = names[p]
        regions[names[p]].append(int(f))
    return TaggedMesh(mesh=mesh, facet_tags=facet_tags, regions=regions)


def _seg_dist(p0, p1):
    p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
    d = p1 - p0
    L2 = d @ d

    def dist(x):
        t = np.clip(((x - p0) @ d) / L2, 0.0, 1.0)
        proj = p0 + t[:, None] * d
        return np.linalg.norm(x - proj, axis=1)

    return dist


def create_crack_mesh(max_res: float = 0.05, smooth: int = 2) -> TaggedMesh:
    """Cracked 2x2 plate with a V-notch at the top center and a circular
    hole at (0.3, 0.3), r=0.2 — the fracture specimen geometry
    (reference generate_mesh.py:16-39). Boundary regions: bottom, right,
    topright, crackright, crackleft, topleft, left, hole."""
    h = max_res
    notch_half = 0.01
    path = [
        ((0.0, 0.0), (2.0, 0.0), "bottom", h),
        ((2.0, 0.0), (2.0, 2.0), "right", h),
        ((2.0, 2.0), (1.0 + notch_half, 2.0), "topright", h),
        ((1.0 + notch_half, 2.0), (1.0, 1.5), "crackright", h / 4),
        ((1.0, 1.5), (1.0 - notch_half, 2.0), "crackleft", h / 4),
        ((1.0 - notch_half, 2.0), (0.0, 2.0), "topleft", h),
        ((0.0, 2.0), (0.0, 0.0), "left", h),
    ]
    center, radius = np.array([0.3, 0.3]), 0.2

    poly = []
    bpts = []
    for p0, p1, name, hh in path:
        seg = _sample_segment(p0, p1, hh, include_start=True)[:-1]
        poly.append(np.asarray(p0, float))
        bpts.append(seg)
    poly = np.array(poly + [])
    # full polygon for inside tests includes intermediate samples for
    # robustness near the thin notch
    poly_fine = np.concatenate(bpts, axis=0)

    nh = max(int(np.ceil(2 * np.pi * radius / h)), 12)
    ang = np.linspace(0, 2 * np.pi, nh, endpoint=False)
    circ = center[None, :] + radius * np.stack(
        [np.cos(ang), np.sin(ang)], axis=1)
    boundary = np.concatenate([poly_fine, circ], axis=0)

    def inside(x):
        in_poly = _point_in_polygon(x, poly_fine)
        out_hole = np.linalg.norm(x - center[None, :], axis=1) > radius
        return in_poly & out_hole

    lat = _hex_lattice(((0.0, 0.0), (2.0, 2.0)), h)
    tree = cKDTree(boundary)
    d, _ = tree.query(lat)
    lat = lat[(d > 0.6 * h) & inside(lat)]

    pts = np.concatenate([boundary, lat], axis=0)
    P, C = _build(pts, inside, cKDTree(boundary), h, smooth=smooth)
    mesh = Mesh("triangle", P, C)

    feats = [(name, _seg_dist(p0, p1)) for p0, p1, name, _ in path]
    feats.append(("hole", lambda x: np.abs(
        np.linalg.norm(x - center[None, :], axis=1) - radius)))
    return _tag_boundary(mesh, feats)


def create_disk_mesh(res: float = 0.1, radius: float = 1.0,
                     center=(0.0, 0.0), smooth: int = 2) -> Mesh:
    """Uniform-resolution disk (the example-01 mesh,
    generate_mesh_gmsh.py:12-43; refinement via refine_uniform)."""
    c = np.asarray(center, float)
    nh = max(int(np.ceil(2 * np.pi * radius / res)), 12)
    ang = np.linspace(0, 2 * np.pi, nh, endpoint=False)
    circ = c[None, :] + radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)

    def inside(x):
        return np.linalg.norm(x - c[None, :], axis=1) < radius - 1e-12

    lat = _hex_lattice((c - radius, c + radius), res)
    tree = cKDTree(circ)
    d, _ = tree.query(lat)
    lat = lat[(d > 0.6 * res) & inside(lat)]
    pts = np.concatenate([circ, lat], axis=0)

    def inside_c(x):
        return np.linalg.norm(x - c[None, :], axis=1) < radius + 1e-9

    P, C = _build(pts, inside_c, cKDTree(circ), res, smooth=smooth)
    return Mesh("triangle", P, C)


def create_star_mesh(res: float = 0.08, n_points: int = 5,
                     r_outer: float = 1.0, r_inner: float = 0.45,
                     smooth: int = 2) -> Mesh:
    """Five-pointed star domain — the planar geometry of MFEM's
    data/star.mesh that the reference's parallel eikonal runs on
    (ex40p via .github/workflows/test_mfem.yml:31-36)."""
    n_half = 2 * n_points
    ang = np.pi / 2 + np.arange(n_half) * (np.pi / n_points)
    rad = np.where(np.arange(n_half) % 2 == 0, r_outer, r_inner)
    poly = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)

    bpts = []
    for i in range(n_half):
        seg = _sample_segment(poly[i], poly[(i + 1) % n_half], res,
                              include_start=True)[:-1]
        bpts.append(seg)
    boundary = np.concatenate(bpts, axis=0)

    def inside(x):
        return _point_in_polygon(x, poly)

    lat = _hex_lattice(((-r_outer, -r_outer), (r_outer, r_outer)), res)
    tree = cKDTree(boundary)
    d, _ = tree.query(lat)
    lat = lat[(d > 0.6 * res) & inside(lat)]
    pts = np.concatenate([boundary, lat], axis=0)
    P, C = _build(pts, inside, cKDTree(boundary), res, smooth=smooth)
    return Mesh("triangle", P, C)


def refine_uniform(mesh: Mesh) -> Mesh:
    """Uniform red refinement: each triangle into 4 (edge midpoints) —
    the MeshHierarchy/refinement-sweep replacement."""
    assert mesh.cell_type == "triangle"
    edge_verts, cell_edges = mesh.edges
    nold = mesh.points.shape[0]
    mid = 0.5 * (mesh.points[edge_verts[:, 0]] + mesh.points[edge_verts[:, 1]])
    pts = np.concatenate([mesh.points, mid], axis=0)
    cv = mesh.cell_vertices
    me = nold + cell_edges  # midpoint ids per cell edge (local edges (1,2),(0,2),(0,1))
    m12, m02, m01 = me[:, 0], me[:, 1], me[:, 2]
    v0, v1, v2 = cv[:, 0], cv[:, 1], cv[:, 2]
    t1 = np.stack([v0, m01, m02], axis=1)
    t2 = np.stack([v1, m12, m01], axis=1)
    t3 = np.stack([v2, m02, m12], axis=1)
    t4 = np.stack([m01, m12, m02], axis=1)
    cells = np.concatenate([t1, t2, t3, t4], axis=0)
    return Mesh("triangle", pts, cells)


def make_quadratic(mesh: Mesh, snap_boundary=None) -> Mesh:
    """Upgrade a P1 triangle mesh to quadratic (isoparametric) geometry:
    one node per edge midpoint, optionally snapped to the true boundary by
    `snap_boundary(points) -> points` (the order-2 gmsh disk of the
    reference, generate_mesh_gmsh.py:12-43 with gmsh order 2)."""
    assert mesh.cell_type == "triangle" and mesh.geom_degree == 1
    edge_verts, cell_edges = mesh.edges
    nold = mesh.points.shape[0]
    mid = 0.5 * (mesh.points[edge_verts[:, 0]] + mesh.points[edge_verts[:, 1]])
    if snap_boundary is not None:
        # snap midpoints of boundary edges
        bfacets = mesh.exterior_facets
        bkey = set(map(tuple, np.sort(mesh.facet_vertices[bfacets], axis=1)
                       .tolist()))
        on_b = np.array([tuple(sorted(e)) in bkey for e in
                         edge_verts.tolist()])
        mid[on_b] = snap_boundary(mid[on_b])
    pts = np.concatenate([mesh.points, mid], axis=0)
    # P2 triangle node order: 3 vertices then edge interiors in the
    # reference-cell edge order (1,2),(0,2),(0,1) — matches
    # lagrange_element("triangle", 2).points
    cells = np.concatenate([mesh.cell_vertices,
                            nold + cell_edges], axis=1)
    return Mesh("triangle", pts, cells, geom_degree=2)


def create_disk_mesh_quadratic(res: float = 0.1, radius: float = 1.0,
                               center=(0.0, 0.0)) -> Mesh:
    """Order-2 disk: curved boundary cells (midpoints snapped to the
    circle), the geometry the reference's obstacle runs use."""
    c = np.asarray(center, float)
    lin = create_disk_mesh(res, radius, center)

    def snap(p):
        v = p - c[None, :]
        return c[None, :] + radius * v / np.linalg.norm(v, axis=1)[:, None]

    return make_quadratic(lin, snap_boundary=snap)
