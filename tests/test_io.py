"""IO tests: VTU round trip, PVD series, XDMF."""

import numpy as np
import pytest

from proximalgalerkin_tpu.io import PVDWriter, read_vtu, write_vtu, write_xdmf
from proximalgalerkin_tpu.mesh import unit_square_mesh
from proximalgalerkin_tpu.mesh.manifolds import mobius_strip


def test_vtu_roundtrip(tmp_path):
    mesh = unit_square_mesh(4, 4)
    u = np.arange(mesh.points.shape[0], dtype=float)
    p = write_vtu(tmp_path / "m.vtu", mesh, point_data={"u": u})
    mesh2, data = read_vtu(p)
    assert mesh2.num_cells == mesh.num_cells
    assert mesh2.points.shape == mesh.points.shape
    # point merge may permute: compare sorted values
    assert np.allclose(np.sort(data["u"]), np.sort(u))


def test_vtu_manifold_quads(tmp_path):
    mesh = mobius_strip(12, 3)
    p = write_vtu(tmp_path / "mob.vtu", mesh)
    mesh2, _ = read_vtu(p)
    assert mesh2.cell_type == "quadrilateral"
    assert mesh2.num_cells == mesh.num_cells
    assert mesh2.gdim == 3


def test_pvd_series(tmp_path):
    mesh = unit_square_mesh(2, 2)
    w = PVDWriter(tmp_path / "series.pvd")
    for t in (0.0, 0.5, 1.0):
        w.write(mesh, t, point_data={"u": np.full(9, t)})
    w.close()
    text = (tmp_path / "series.pvd").read_text()
    assert text.count("DataSet") == 3
    assert (tmp_path / "series_data" / "step_000002.vtu").exists()


def test_xdmf(tmp_path):
    mesh = unit_square_mesh(3, 3)
    p = write_xdmf(tmp_path / "m.xdmf", mesh,
                   point_data={"u": np.zeros(16)})
    assert p.exists()
    assert "Triangle" in p.read_text()


def test_xdmf_roundtrip(tmp_path):
    from proximalgalerkin_tpu.io import read_xdmf
    mesh = unit_square_mesh(3, 3)
    u = np.linspace(0, 1, mesh.points.shape[0])
    p = write_xdmf(tmp_path / "rt.xdmf", mesh, point_data={"u": u})
    mesh2, data = read_xdmf(p)
    assert mesh2.num_cells == mesh.num_cells
    assert np.allclose(mesh2.points, mesh.points)
    assert np.allclose(data["u"], u)
