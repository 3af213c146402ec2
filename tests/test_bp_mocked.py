"""Execute the VTX ``.bp`` writer logic against a mocked ``adios2``.

The real ``adios2`` bindings are absent in this image, so
``tests/test_post_processing.py``'s round-trip skips and the writer in
``networks_fenicsx_tpu/io/bp.py`` — the analog of the reference's primary
export artifact (reference ``post_processing.py:68-78``) — would otherwise
never execute.  These tests inject a recording fake ``adios2`` module with
the Stream API surface the writer uses (``Stream``, ``begin_step``/
``end_step``, ``write``, ``write_attribute``, ``close``) and drive
``write_bp`` / ``VTXTimeSeriesWriter`` / ``export_functions(format="bp")``
end-to-end, asserting the declared variables, shapes, step structure and
the ``vtk.xml`` attribute.  The real-bindings round-trip stays in
``test_post_processing.py`` (auto-activates where adios2 exists).
"""

from __future__ import annotations

import sys
import types
import xml.etree.ElementTree as ET

import numpy as np
import pytest


class _FakeStream:
    """Records every adios2.Stream call the VTX writer makes."""

    instances: list["_FakeStream"] = []

    def __init__(self, path, mode):
        assert mode == "w"
        self.path = path
        self.steps: list[dict] = []
        self.attributes: dict[str, str] = {}
        self._current: dict | None = None
        self.closed = False
        _FakeStream.instances.append(self)

    def begin_step(self):
        assert self._current is None, "begin_step inside an open step"
        self._current = {}

    def write(self, name, value, shape=None, start=None, count=None):
        assert self._current is not None, "write outside begin/end step"
        arr = np.asarray(value)
        if shape is not None:
            assert list(shape) == list(arr.shape)
            assert list(start) == [0] * arr.ndim
            assert list(count) == list(arr.shape)
        self._current[name] = arr.copy()

    def write_attribute(self, name, value):
        assert name not in self.attributes, "attribute rewritten"
        self.attributes[name] = value

    def end_step(self):
        assert self._current is not None, "end_step without begin_step"
        self.steps.append(self._current)
        self._current = None

    def close(self):
        self.closed = True


@pytest.fixture()
def fake_adios2(monkeypatch):
    mod = types.ModuleType("adios2")
    mod.Stream = _FakeStream
    monkeypatch.setitem(sys.modules, "adios2", mod)
    _FakeStream.instances = []
    return mod


def test_write_bp_declares_vtx_schema(fake_adios2, tmp_path):
    from networks_fenicsx_tpu.io.bp import VTK_LINE, write_bp

    pts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    cells = np.array([[0, 1], [1, 2]])
    p = np.array([1.0, 2.0, 3.0])
    q = np.array([10.0, 20.0])
    out = write_bp(
        tmp_path / "pressure.bp", pts, cells, VTK_LINE,
        point_data={"pressure": p}, cell_data={"flux": q}, time=0.25,
    )
    assert out == tmp_path / "pressure.bp"
    (s,) = _FakeStream.instances
    assert s.closed
    (step,) = s.steps
    # VTX scalars
    assert step["NumberOfNodes"] == np.uint32(3)
    assert step["NumberOfCells"] == np.uint32(2)
    assert step["types"] == np.uint32(VTK_LINE)
    assert step["step"] == np.float64(0.25)
    # geometry zero-padded to 3 components
    assert step["geometry"].shape == (3, 3)
    np.testing.assert_array_equal(step["geometry"][:, :2], pts)
    np.testing.assert_array_equal(step["geometry"][:, 2], 0.0)
    # connectivity: leading per-cell count (VTK legacy convention)
    assert step["connectivity"].dtype == np.int64
    np.testing.assert_array_equal(
        step["connectivity"], [[2, 0, 1], [2, 1, 2]]
    )
    np.testing.assert_array_equal(step["pressure"], p)
    np.testing.assert_array_equal(step["flux"], q)


def test_write_bp_vtk_xml_attribute(fake_adios2, tmp_path):
    from networks_fenicsx_tpu.io.bp import write_bp

    pts = np.zeros((2, 3))
    cells = np.array([[0, 1]])
    write_bp(tmp_path / "f.bp", pts, cells,
             point_data={"a b": np.zeros(2)}, cell_data={"c": np.zeros(1)})
    (s,) = _FakeStream.instances
    xml = s.attributes["vtk.xml"]
    root = ET.fromstring(xml)  # well-formed, even with the space in "a b"
    assert root.tag == "VTKFile"
    piece = root.find("UnstructuredGrid/Piece")
    assert piece.get("NumberOfPoints") == "NumberOfNodes"
    assert piece.get("NumberOfCells") == "NumberOfCells"
    names = [d.get("Name") for d in piece.findall("PointData/DataArray")]
    assert "a b" in names and "TIME" in names
    assert [d.get("Name") for d in piece.findall("CellData/DataArray")] == ["c"]
    geo = piece.find("Points/DataArray")
    assert geo.get("Name") == "geometry"


def test_vtx_time_series_steps_and_single_attribute(fake_adios2, tmp_path):
    from networks_fenicsx_tpu.io.bp import VTK_LINE, VTXTimeSeriesWriter

    pts = np.array([[0.0, 0.0], [1.0, 0.0]])
    cells = np.array([[0, 1]])
    with VTXTimeSeriesWriter(tmp_path / "ts.bp", pts, cells, VTK_LINE) as w:
        w.write(0.0, point_data={"p": np.array([0.0, 1.0])})
        w.write(0.5, point_data={"p": np.array([2.0, 3.0])})
        with pytest.raises(ValueError, match="same field names"):
            w.write(1.0, point_data={"other": np.zeros(2)})
    (s,) = _FakeStream.instances
    assert s.closed
    assert len(s.steps) == 2
    assert [float(st["step"]) for st in s.steps] == [0.0, 0.5]
    # geometry present every step (VTX readers expect step-local geometry)
    for st in s.steps:
        assert st["geometry"].shape == (2, 3)
    # the vtk.xml attribute is global in BP: written exactly once
    assert list(s.attributes) == ["vtk.xml"]


def test_write_bp_length_validation(fake_adios2, tmp_path):
    from networks_fenicsx_tpu.io.bp import write_bp

    pts = np.zeros((3, 2))
    cells = np.array([[0, 1], [1, 2]])
    with pytest.raises(ValueError, match="point field"):
        write_bp(tmp_path / "x.bp", pts, cells,
                 point_data={"p": np.zeros(2)})
    with pytest.raises(ValueError, match="cell field"):
        write_bp(tmp_path / "y.bp", pts, cells,
                 cell_data={"q": np.zeros(3)})


def test_export_functions_bp_artifact_names(fake_adios2, tmp_path):
    """export_functions(format="bp") writes the reference's artifact set
    (flux_<i>.bp, pressure.bp, lm.bp — reference post_processing.py:55-78)
    through the mocked stream."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        network_generation,
        post_processing,
    )

    G = network_generation.make_tree(2, 1, 3)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    s = Solver(asm)
    s.assemble()
    sol = s.solve()
    post_processing.export_functions(sol, tmp_path, format="bp", time=0.0)
    paths = sorted(st.path for st in _FakeStream.instances)
    names = [p.rsplit("/", 1)[-1] for p in paths]
    n_colors = len(mesh.submeshes)
    expected = sorted(
        [f"flux_{i}.bp" for i in range(n_colors)] + ["pressure.bp", "lm.bp"]
    )
    assert names == expected
    for st in _FakeStream.instances:
        assert st.closed and len(st.steps) == 1
        assert "vtk.xml" in st.attributes
