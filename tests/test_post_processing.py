"""Post-processing: global flux extraction and VTU export."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.post_processing import (
    export_functions,
    export_submeshes,
    extract_global_flux,
)


def _solve_y(N=4):
    G = network_generation.make_tree(2, 1, 3)
    mesh = NetworkMesh(G, N=N)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    solver = Solver(asm)
    solver.assemble()
    return mesh, solver.solve()


def test_extract_global_flux():
    mesh, sol = _solve_y()
    gq = extract_global_flux(mesh, sol)
    assert gq.name == "Global_Flux"
    vals = gq.values.reshape(mesh.num_cells, -1)
    # Y-bifurcation analytic: root edge flux 2/(s+1), branches 1/(s+1)
    s = np.sqrt(2.5)
    expected_edge = np.where(mesh.cell_edge == 0, 2.0 / (s + 1), 1.0 / (s + 1))
    np.testing.assert_allclose(
        vals, np.broadcast_to(expected_edge[:, None], vals.shape), atol=1e-9
    )


def test_export_functions(tmp_path):
    mesh, sol = _solve_y()
    export_functions(sol, outpath=tmp_path)
    M = mesh.num_edge_colors
    for i in range(M):
        assert (tmp_path / f"flux_{i}.vtu").exists()
    assert (tmp_path / "pressure.vtu").exists()
    assert (tmp_path / "lm.vtu").exists()
    text = (tmp_path / "pressure.vtu").read_text()
    assert "UnstructuredGrid" in text and "pressure" in text


def test_export_submeshes(tmp_path):
    mesh, _ = _solve_y()
    export_submeshes(mesh, tmp_path)  # xdmf (reference parity)
    for i in range(mesh.num_edge_colors):
        f = tmp_path / f"submesh_{i}.xdmf"
        assert f.exists()
        text = f.read_text()
        assert "Polyline" in text and "vertex_markers" in text
    export_submeshes(mesh, tmp_path, format="vtu")
    for i in range(mesh.num_edge_colors):
        assert (tmp_path / f"submesh_{i}.vtu").exists()


def test_global_flux_continuous_at_junction_balance():
    """Global flux values at a junction satisfy conservation when summed with
    in/out signs."""
    mesh, sol = _solve_y(N=2)
    gq = extract_global_flux(mesh, sol)
    vals = gq.values.reshape(mesh.num_cells, -1)
    N = mesh.N
    for b_idx, node in enumerate(mesh.bifurcation_values):
        qin = sum(vals[int(e) * N + (N - 1), -1] for e in mesh.in_edge_ids(b_idx))
        qout = sum(vals[int(e) * N, 0] for e in mesh.out_edge_ids(b_idx))
        assert abs(qin - qout) < 1e-9


def test_export_functions_high_degree_pressure(tmp_path):
    """Regression: continuous pressure of degree >= 2 has cell-interior dofs;
    the VTU must pair every written point with a value (VTK rejects
    NumberOfPoints > len(PointData))."""
    G = network_generation.make_tree(2, 1, 3)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh, flux_degree=2, pressure_degree=2)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()
    export_functions(sol, outpath=tmp_path)
    import re

    text = (tmp_path / "pressure.vtu").read_text()
    n_points = int(re.search(r'NumberOfPoints="(\d+)"', text).group(1))
    assert n_points == mesh.num_vertices


def test_vtu_binary_roundtrip(tmp_path):
    """Binary (inline base64) VTU round-trips points/cells/data bit-exactly."""
    from networks_fenicsx_tpu.io.vtk import VTK_LINE, read_vtu, write_vtu

    rng = np.random.default_rng(7)
    pts = rng.standard_normal((23, 3))
    cells = np.stack([np.arange(22), np.arange(1, 23)], axis=1)
    pd = {"speed": rng.standard_normal(23)}
    cd = {"mark": rng.standard_normal(22)}
    for fmt in ("binary", "ascii"):
        p = write_vtu(tmp_path / f"{fmt}.vtu", pts, cells, VTK_LINE,
                      point_data=pd, cell_data=cd, fmt=fmt)
        rp, rc, rpd, rcd = read_vtu(p)
        np.testing.assert_array_equal(rp, pts)  # exact: f64 through base64/repr
        np.testing.assert_array_equal(rc, cells)
        np.testing.assert_array_equal(rpd["speed"], pd["speed"])
        np.testing.assert_array_equal(rcd["mark"], cd["mark"])


def test_vtu_auto_binary_at_scale(tmp_path):
    """Large grids default to the binary encoding and stay compact."""
    from networks_fenicsx_tpu.io.vtk import VTK_LINE, read_vtu, write_vtu

    n = 60_000
    pts = np.random.default_rng(0).standard_normal((n, 3))
    cells = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    p = write_vtu(tmp_path / "big.vtu", pts, cells, VTK_LINE,
                  point_data={"v": pts[:, 0]})
    text = p.read_text()
    assert 'format="binary"' in text
    # ~480k values total (pts + conn + offsets + types + v) at ~10.7 B/value
    # base64 vs ~19 B/value ascii
    assert p.stat().st_size < 6_000_000
    rp, _, rpd, _ = read_vtu(p)
    np.testing.assert_array_equal(rp, pts)
    np.testing.assert_array_equal(rpd["v"], pts[:, 0])


def test_xdmf_roundtrip_xml_and_hdf5(tmp_path):
    """XDMF round-trips in both storage formats; HDF5 sidecar matches the
    reference's XDMFFile layout (heavy data in <name>.h5, Format="HDF")."""
    from networks_fenicsx_tpu.io.xdmf import read_xdmf, write_xdmf

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((17, 3))
    cells = np.stack([np.arange(16), np.arange(1, 17)], axis=1)
    pd = {"marker": rng.standard_normal(17)}
    cd = {"color": rng.standard_normal(16)}
    for fmt in ("xml", "hdf5"):
        p = write_xdmf(tmp_path / f"{fmt}.xdmf", pts, cells,
                       point_data=pd, cell_data=cd, fmt=fmt)
        rp, rc, rpd, rcd = read_xdmf(p)
        np.testing.assert_array_equal(rc, cells)
        np.testing.assert_array_equal(rpd["marker"], pd["marker"])
        np.testing.assert_array_equal(rcd["color"], cd["color"])
        if fmt == "hdf5":
            np.testing.assert_array_equal(rp, pts)  # bit-exact via HDF5
            assert (tmp_path / "hdf5.h5").exists()
            assert 'Format="HDF"' in p.read_text()
        else:
            np.testing.assert_allclose(rp, pts, rtol=1e-15)
            assert "Format=\"HDF\"" not in p.read_text()


def test_xdmf_auto_hdf5_at_scale(tmp_path):
    """Large grids default to the HDF5 sidecar (reference XDMFFile layout)
    and the .xdmf stays tiny."""
    from networks_fenicsx_tpu.io.xdmf import read_xdmf, write_xdmf

    n = 30_000
    pts = np.random.default_rng(1).standard_normal((n, 3))
    cells = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    p = write_xdmf(tmp_path / "big.xdmf", pts, cells,
                   cell_data={"q": pts[:-1, 0]})
    assert (tmp_path / "big.h5").exists()
    assert p.stat().st_size < 5_000  # XML holds only references
    rp, rc, _, rcd = read_xdmf(p)
    np.testing.assert_array_equal(rp, pts)
    np.testing.assert_array_equal(rcd["q"], pts[:-1, 0])


def test_export_submeshes_hdf5(tmp_path):
    mesh, _ = _solve_y()
    export_submeshes(mesh, tmp_path, fmt="hdf5")
    from networks_fenicsx_tpu.io.xdmf import read_xdmf

    for i, view in enumerate(mesh.submeshes):
        f = tmp_path / f"submesh_{i}.xdmf"
        assert f.exists() and (tmp_path / f"submesh_{i}.h5").exists()
        pts, cells, pd, _ = read_xdmf(f)
        assert cells.shape == view.cells.shape
        assert "vertex_markers" in pd


def test_time_series_writer_pvd(tmp_path):
    """TimeSeriesWriter writes per-frame VTUs + valid .pvd collections
    (the reference's timestamped VTXWriter.write(t) parity)."""
    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        network_generation,
    )
    from networks_fenicsx_tpu.io.vtk import read_pvd, read_vtu
    from networks_fenicsx_tpu.post_processing import TimeSeriesWriter

    G = network_generation.make_tree(2, 1.0, 2.0)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    writer = TimeSeriesWriter(tmp_path)
    times = [0.0, 0.5, 1.0]
    lam_per_frame = []
    for t in times:
        asm.compute_forms(p_bc_ex=lambda x, s=1.0 + t: s * x[1])
        s = Solver(asm)
        s.assemble()
        sol = s.solve()
        lam_per_frame.append(float(sol[-1].values[0]))
        writer.write(sol, t)
    assert writer.num_frames == 3
    for series in ("flux_0", "pressure", "lm"):
        frames = read_pvd(tmp_path / f"{series}.pvd")
        assert [t for t, _ in frames] == times
        for _, fname in frames:
            assert (tmp_path / fname).exists()
    # frame data reflects the per-step solutions (λ scales with the BC)
    for i, (_, fname) in enumerate(read_pvd(tmp_path / "lm.pvd")):
        _, _, pd, _ = read_vtu(tmp_path / fname)
        np.testing.assert_allclose(pd["global_flux"][0], lam_per_frame[i], atol=1e-13)
    # λ scales linearly with the boundary amplitude — frames genuinely differ
    np.testing.assert_allclose(
        lam_per_frame[2] / lam_per_frame[0], 2.0, atol=1e-10
    )


def test_export_functions_time_stamp(tmp_path):
    """export_functions(time=...) wraps blocks in single-frame .pvd files."""
    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        network_generation,
    )
    from networks_fenicsx_tpu.io.vtk import read_pvd
    from networks_fenicsx_tpu.post_processing import export_functions

    G = network_generation.make_tree(2, 1.0, 2.0)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    s = Solver(asm)
    s.assemble()
    sol = s.solve()
    export_functions(sol, tmp_path, time=0.25)
    frames = read_pvd(tmp_path / "pressure.pvd")
    assert frames == [(0.25, "pressure.vtu")]


def test_write_pvd_escapes_attribute_values(tmp_path):
    """File names with XML-special characters must produce a well-formed
    .pvd (attribute values are escaped, not interpolated raw)."""
    import xml.etree.ElementTree as ET

    from networks_fenicsx_tpu.io.vtk import write_pvd

    weird = 'frame &1<2 "q".vtu'
    p = write_pvd(tmp_path / "series.pvd", [(0.0, weird), (1.0, "plain.vtu")])
    root = ET.parse(p).getroot()
    files = [ds.get("file") for ds in root.iter("DataSet")]
    assert files == [weird, "plain.vtu"]


def test_export_functions_bp_format(tmp_path):
    """format="bp" routes the ADIOS2 VTX writer (reference
    post_processing.py:55-78): with adios2 present the datasets
    round-trip; without it the error is clear and .vtu output is
    untouched."""
    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        network_generation,
    )
    from networks_fenicsx_tpu.io.bp import have_adios2
    from networks_fenicsx_tpu.post_processing import export_functions

    G = network_generation.make_tree(2, 1.0, 2.0)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    s = Solver(asm)
    s.assemble()
    sol = s.solve()
    if not have_adios2():
        with pytest.raises(RuntimeError, match="adios2"):
            export_functions(sol, tmp_path, format="bp")
        return
    export_functions(sol, tmp_path, time=0.25, format="bp")  # pragma: no cover
    import adios2

    with adios2.FileReader(str(tmp_path / "pressure.bp")) as f:
        geo = f.read("geometry")
        assert geo.shape == (mesh.num_vertices, 3)
        conn = f.read("connectivity")
        assert conn.shape == (mesh.num_cells, 3)
        np.testing.assert_allclose(
            f.read("pressure"), np.asarray(sol[-2].values)
        )
        vtkxml = f.read_attribute_string("vtk.xml")
        assert "UnstructuredGrid" in vtkxml[0]


def test_write_bp_unknown_format_rejected(tmp_path):
    """_write_blocks refuses unknown export formats loudly."""
    from networks_fenicsx_tpu.post_processing import _write_blocks

    with pytest.raises(ValueError, match="unknown export format"):
        _write_blocks([], tmp_path, format="hdf")
