"""VTU / PVD / XDMF output and VTU ingestion.

Replaces the reference's ADIOS2 VTXWriter / XDMFFile / VTKFile output
stack (obstacle_pg.py:242, fracture_dolfinx.py:183-186, eikonal pointcloud
writer) with self-contained ASCII VTU (ParaView/VisIt-readable), PVD time
series, inline-data XDMF, and a VTU reader covering the Möbius ingestion
path (read_mobius_dolfinx.py:41-85).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..mesh.mesh import Mesh

_VTK_TYPE = {"interval": 3, "triangle": 5, "quadrilateral": 8,
             "tetrahedron": 10, "hexahedron": 11}
# VTK expects quad/hex corner ordering (counterclockwise), ours is
# lexicographic — permute on write.
_VTK_PERM = {"quadrilateral": [0, 1, 3, 2],
             "hexahedron": [0, 1, 3, 2, 4, 5, 7, 6]}
_VTK_INV = {3: "interval", 5: "triangle", 8: "quadrilateral",
            9: "quadrilateral", 10: "tetrahedron", 11: "hexahedron",
            12: "hexahedron"}


def _fmt(arr: np.ndarray) -> str:
    return " ".join(f"{v:.16g}" for v in np.asarray(arr).reshape(-1))


def write_vtu(path, mesh: Mesh,
              point_data: Optional[Dict[str, np.ndarray]] = None,
              cell_data: Optional[Dict[str, np.ndarray]] = None) -> Path:
    """Write the mesh and P1/DG0 fields to an ASCII .vtu file.

    point_data values: (npoints,) or (npoints, k); cell_data: (ncells,)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pts3 = np.zeros((mesh.points.shape[0], 3))
    pts3[:, : mesh.gdim] = mesh.points
    cells = mesh.cell_vertices
    if mesh.cell_type in _VTK_PERM:
        cells = cells[:, _VTK_PERM[mesh.cell_type]]
    nv = cells.shape[1]
    ncells = cells.shape[0]

    lines = []
    a = lines.append
    a('<?xml version="1.0"?>')
    a('<VTKFile type="UnstructuredGrid" version="0.1" '
      'byte_order="LittleEndian">')
    a("<UnstructuredGrid>")
    a(f'<Piece NumberOfPoints="{len(pts3)}" NumberOfCells="{ncells}">')
    a("<Points>")
    a('<DataArray type="Float64" NumberOfComponents="3" format="ascii">')
    a(_fmt(pts3))
    a("</DataArray></Points>")
    a("<Cells>")
    a('<DataArray type="Int32" Name="connectivity" format="ascii">')
    a(" ".join(map(str, cells.reshape(-1))))
    a("</DataArray>")
    a('<DataArray type="Int32" Name="offsets" format="ascii">')
    a(" ".join(str(nv * (i + 1)) for i in range(ncells)))
    a("</DataArray>")
    a('<DataArray type="UInt8" Name="types" format="ascii">')
    a(" ".join([str(_VTK_TYPE[mesh.cell_type])] * ncells))
    a("</DataArray></Cells>")
    if point_data:
        a("<PointData>")
        for name, vals in point_data.items():
            v = np.asarray(vals)
            ncomp = 1 if v.ndim == 1 else v.shape[1]
            a(f'<DataArray type="Float64" Name="{name}" '
              f'NumberOfComponents="{ncomp}" format="ascii">')
            a(_fmt(v))
            a("</DataArray>")
        a("</PointData>")
    if cell_data:
        a("<CellData>")
        for name, vals in cell_data.items():
            a(f'<DataArray type="Float64" Name="{name}" '
              'NumberOfComponents="1" format="ascii">')
            a(_fmt(vals))
            a("</DataArray>")
        a("</CellData>")
    a("</Piece></UnstructuredGrid></VTKFile>")
    path.write_text("\n".join(lines))
    return path


def read_vtu(path) -> Tuple[Mesh, Dict[str, np.ndarray]]:
    """Read an ASCII VTU (single piece, single cell type) — the Möbius
    ingestion path. Returns (mesh, point_data). Duplicate points are
    merged (read_mobius_dolfinx.py:18-38)."""
    root = ET.parse(Path(path)).getroot()
    piece = root.find(".//Piece")
    pts = np.fromstring(
        piece.find("Points/DataArray").text, sep=" ").reshape(-1, 3)
    conn = off = types = None
    for da in piece.find("Cells"):
        nm = da.get("Name")
        if nm == "connectivity":
            conn = np.fromstring(da.text, sep=" ", dtype=np.int64)
        elif nm == "offsets":
            off = np.fromstring(da.text, sep=" ", dtype=np.int64)
        elif nm == "types":
            types = np.fromstring(da.text, sep=" ", dtype=np.int64)
    tset = set(types.tolist())
    assert len(tset) == 1, "mixed cell types not supported"
    ctype = _VTK_INV[types[0]]
    nv = off[0]
    cells = conn.reshape(-1, nv)
    if ctype in _VTK_PERM:
        inv = np.argsort(_VTK_PERM[ctype])
        cells = cells[:, inv]
    # drop the z column for planar meshes
    if np.allclose(pts[:, 2], 0.0):
        pts = pts[:, :2]
    # merge duplicate points
    scale = max(np.ptp(pts, axis=0).max(), 1.0)
    key = np.round(pts / (1e-10 * scale)).astype(np.int64)
    _, first, inverse = np.unique(key, axis=0, return_index=True,
                                  return_inverse=True)
    mesh = Mesh(ctype, pts[first], inverse[cells].astype(np.int32))

    pdata = {}
    pd = piece.find("PointData")
    if pd is not None:
        for da in pd:
            v = np.fromstring(da.text, sep=" ")
            nc = int(da.get("NumberOfComponents", "1"))
            v = v.reshape(-1, nc) if nc > 1 else v
            pdata[da.get("Name")] = v[first]
    return mesh, pdata


def read_xdmf(path) -> Tuple[Mesh, Dict[str, np.ndarray]]:
    """Read an inline-data XDMF file (the format write_xdmf emits — the
    XDMFFile read path for the obstacle example's --file-path inputs)."""
    root = ET.parse(Path(path)).getroot()
    grid = root.find(".//Grid")
    topo = grid.find("Topology")
    geom = grid.find("Geometry")
    tt = topo.get("TopologyType").lower()
    ctype = {"triangle": "triangle", "quadrilateral": "quadrilateral",
             "tetrahedron": "tetrahedron", "hexahedron": "hexahedron",
             "polyline": "interval"}[tt]
    cells = np.fromstring(topo.find("DataItem").text, sep=" ",
                          dtype=np.int64)
    nv = int(topo.find("DataItem").get("Dimensions").split()[-1])
    cells = cells.reshape(-1, nv)
    if ctype in _VTK_PERM:
        inv = np.argsort(_VTK_PERM[ctype])
        cells = cells[:, inv]
    pts = np.fromstring(geom.find("DataItem").text, sep=" ")
    gdim = 2 if geom.get("GeometryType") == "XY" else 3
    pts = pts.reshape(-1, gdim)
    data = {}
    for attr in grid.findall("Attribute"):
        v = np.fromstring(attr.find("DataItem").text, sep=" ")
        dims = attr.find("DataItem").get("Dimensions").split()
        if len(dims) > 1:
            v = v.reshape(-1, int(dims[1]))
        data[attr.get("Name")] = v
    return Mesh(ctype, pts, cells.astype(np.int32)), data


class PVDWriter:
    """Time-series collection of VTU files (the VTXWriter/XDMF time-series
    role, e.g. gradient_constraint_dolfinx.py:159-166)."""

    def __init__(self, path):
        self.path = Path(path)
        self.dir = self.path.parent / (self.path.stem + "_data")
        self.dir.mkdir(parents=True, exist_ok=True)
        self._steps: List[Tuple[float, str]] = []

    def write(self, mesh: Mesh, time: float,
              point_data: Optional[Dict[str, np.ndarray]] = None,
              cell_data: Optional[Dict[str, np.ndarray]] = None) -> None:
        fname = self.dir / f"step_{len(self._steps):06d}.vtu"
        write_vtu(fname, mesh, point_data, cell_data)
        rel = fname.relative_to(self.path.parent)
        self._steps.append((time, str(rel)))
        self._flush()

    def _flush(self):
        lines = ['<?xml version="1.0"?>',
                 '<VTKFile type="Collection" version="0.1">',
                 "<Collection>"]
        for t, f in self._steps:
            lines.append(f'<DataSet timestep="{t}" part="0" file="{f}"/>')
        lines += ["</Collection>", "</VTKFile>"]
        self.path.write_text("\n".join(lines))

    def close(self):
        self._flush()


def write_xdmf(path, mesh: Mesh,
               point_data: Optional[Dict[str, np.ndarray]] = None) -> Path:
    """Minimal XDMF with inline (XML) data — reader-compatible with
    ParaView; the XDMFFile replacement for small/medium meshes."""
    topo_type = {"triangle": "Triangle", "quadrilateral": "Quadrilateral",
                 "tetrahedron": "Tetrahedron", "hexahedron": "Hexahedron",
                 "interval": "Polyline"}[mesh.cell_type]
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    cells = mesh.cell_vertices
    if mesh.cell_type in _VTK_PERM:
        cells = cells[:, _VTK_PERM[mesh.cell_type]]
    gdim = mesh.gdim
    geom_type = "XY" if gdim == 2 else "XYZ"
    lines = ['<?xml version="1.0"?>', '<Xdmf Version="3.0">', "<Domain>",
             '<Grid Name="mesh" GridType="Uniform">',
             f'<Topology TopologyType="{topo_type}" '
             f'NumberOfElements="{mesh.num_cells}">',
             f'<DataItem Dimensions="{mesh.num_cells} {cells.shape[1]}" '
             'Format="XML">', " ".join(map(str, cells.reshape(-1))),
             "</DataItem></Topology>",
             f'<Geometry GeometryType="{geom_type}">',
             f'<DataItem Dimensions="{mesh.points.shape[0]} {gdim}" '
             'Format="XML">', _fmt(mesh.points), "</DataItem></Geometry>"]
    for name, vals in (point_data or {}).items():
        v = np.asarray(vals)
        dims = f"{v.shape[0]}" + (f" {v.shape[1]}" if v.ndim > 1 else "")
        lines += [f'<Attribute Name="{name}" Center="Node">',
                  f'<DataItem Dimensions="{dims}" Format="XML">',
                  _fmt(v), "</DataItem></Attribute>"]
    lines += ["</Grid>", "</Domain>", "</Xdmf>"]
    path.write_text("\n".join(lines))
    return path
