"""XDMF writer/reader for 1D network meshes.

Parity companion to the reference's XDMF submesh export
(reference ``post_processing.py:81-97`` via ``dolfinx.io.XDMFFile``):
polyline topology + XYZ geometry + named vertex/cell attributes, readable
by ParaView.

Two storage formats, mirroring the reference stack's XDMF+HDF5 layout:

* ``"hdf5"`` (default for large grids when :mod:`h5py` is available):
  heavy arrays land in a sibling ``<name>.h5`` file and the ``.xdmf`` XML
  carries ``Format="HDF"`` references — an XDMF+HDF5 sidecar layout
  analogous to what ``dolfinx.io.XDMFFile`` produces (the dataset paths
  differ; XML-following readers such as ParaView and meshio treat both
  identically).  Bit-exact float64/int64 round trip.
* ``"xml"``: data embedded inline in the XML — self-contained, used for
  small demo files and as the fallback when h5py is missing.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import numpy.typing as npt

__all__ = ["write_xdmf", "read_xdmf"]

# grids with more data values than this default to the HDF5 heavy-data format
_HDF5_THRESHOLD = 4096


def _have_h5py() -> bool:
    try:
        import h5py  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - h5py present in target image
        return False


def _dtype_attrs(a: np.ndarray) -> str:
    if a.dtype.kind in "iu":
        return 'DataType="Int" Precision="8"'
    return 'DataType="Float" Precision="8"'


def _item_xml(a: np.ndarray, per_line: int) -> str:
    flat = np.asarray(a).reshape(-1, per_line)
    if flat.dtype.kind in "iu":
        body = "\n".join(" ".join(str(int(v)) for v in row) for row in flat)
    else:
        # 17 significant digits: exact float64 round trip
        body = "\n".join(" ".join(f"{float(v):.17g}" for v in row) for row in flat)
    dims = f"{flat.shape[0]} {flat.shape[1]}" if per_line > 1 else f"{flat.size}"
    return (
        f'<DataItem Dimensions="{dims}" {_dtype_attrs(flat)} Format="XML">\n'
        f"{body}\n</DataItem>"
    )


def _item_hdf(a: np.ndarray, per_line: int, h5name: str, dset: str) -> str:
    flat = np.asarray(a).reshape(-1, per_line)
    dims = f"{flat.shape[0]} {flat.shape[1]}" if per_line > 1 else f"{flat.size}"
    return (
        f'<DataItem Dimensions="{dims}" {_dtype_attrs(flat)} Format="HDF">\n'
        f"{h5name}:{dset}\n</DataItem>"
    )


def write_xdmf(
    path: str | Path,
    points: npt.NDArray[np.floating],
    cells: npt.NDArray[np.integer],
    point_data: dict[str, npt.NDArray] | None = None,
    cell_data: dict[str, npt.NDArray] | None = None,
    grid_name: str = "mesh",
    fmt: str = "auto",
) -> Path:
    """Write a polyline grid with attributes to an ``.xdmf`` file.

    Args:
        path: Output ``.xdmf`` path (parent directories are created).
        points: (n_pts, gdim) coordinates; padded to XYZ as XDMF requires.
        cells: (n_cells, 2) polyline connectivity.
        point_data / cell_data: Named scalar arrays.
        grid_name: XDMF grid name.
        fmt: ``"xml"`` (inline data), ``"hdf5"`` (heavy data in a sibling
            ``.h5`` file, the reference's ``XDMFFile`` layout) or ``"auto"``
            (hdf5 once the grid exceeds a few thousand values and h5py is
            importable).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    points = np.asarray(points, dtype=np.float64)
    pts3 = np.zeros((points.shape[0], 3))
    pts3[:, : points.shape[1]] = points
    cells = np.asarray(cells, dtype=np.int64).reshape(-1, 2)
    point_data = {
        k: np.asarray(v, dtype=np.float64) for k, v in (point_data or {}).items()
    }
    cell_data = {
        k: np.asarray(v, dtype=np.float64) for k, v in (cell_data or {}).items()
    }

    if fmt == "auto":
        n_values = (
            pts3.size
            + cells.size
            + sum(v.size for v in point_data.values())
            + sum(v.size for v in cell_data.values())
        )
        fmt = "hdf5" if (n_values > _HDF5_THRESHOLD and _have_h5py()) else "xml"
    if fmt not in ("xml", "hdf5"):
        raise ValueError(f"unknown xdmf format {fmt!r}")

    if fmt == "hdf5":
        import h5py

        h5path = path.with_suffix(".h5")
        datasets: dict[str, np.ndarray] = {"/Mesh/geometry": pts3, "/Mesh/topology": cells}

        def item(a: np.ndarray, per_line: int, dset: str) -> str:
            return _item_hdf(a, per_line, h5path.name, dset)

        # Namespace by attribute center: a point and a cell attribute may
        # legitimately share a name (e.g. "pressure" sampled both ways) and
        # must not overwrite each other's dataset.
        for name, arr in point_data.items():
            datasets[f"/Function/point/{name}"] = arr
        for name, arr in cell_data.items():
            datasets[f"/Function/cell/{name}"] = arr
        with h5py.File(h5path, "w") as h5:
            for dset, arr in datasets.items():
                h5.create_dataset(dset, data=arr)
    else:

        def item(a: np.ndarray, per_line: int, dset: str) -> str:
            return _item_xml(a, per_line)

    attrs = []
    for name, arr in point_data.items():
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="Scalar" Center="Node">\n'
            f"{item(arr, 1, f'/Function/point/{name}')}\n</Attribute>"
        )
    for name, arr in cell_data.items():
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="Scalar" Center="Cell">\n'
            f"{item(arr, 1, f'/Function/cell/{name}')}\n</Attribute>"
        )
    attr_block = "\n".join(attrs)

    xml = f"""<?xml version="1.0"?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0">
<Domain>
<Grid Name="{grid_name}" GridType="Uniform">
<Topology TopologyType="Polyline" NodesPerElement="2" NumberOfElements="{cells.shape[0]}">
{item(cells, 2, "/Mesh/topology")}
</Topology>
<Geometry GeometryType="XYZ">
{item(pts3, 3, "/Mesh/geometry")}
</Geometry>
{attr_block}
</Grid>
</Domain>
</Xdmf>
"""
    path.write_text(xml)
    return path


def read_xdmf(path: str | Path):
    """Read an ``.xdmf`` written by :func:`write_xdmf` (xml or hdf5 data).

    Returns ``(points, cells, point_data, cell_data)``; HDF5-backed files
    round-trip bit-exactly.
    """
    import xml.etree.ElementTree as ET

    path = Path(path)
    root = ET.parse(path).getroot()
    grid = root.find("./Domain/Grid")
    if grid is None:
        raise ValueError(f"no Grid in XDMF file {path}")

    def decode(di) -> np.ndarray:
        dims = tuple(int(d) for d in di.get("Dimensions").split())
        dtype = np.int64 if di.get("DataType") == "Int" else np.float64
        text = (di.text or "").strip()
        if di.get("Format") == "HDF":
            import h5py

            h5name, dset = text.split(":", 1)
            with h5py.File(path.parent / h5name, "r") as h5:
                arr = np.asarray(h5[dset], dtype=dtype)
        else:
            arr = np.array(text.split(), dtype=dtype) if text else np.empty(0, dtype)
        return arr.reshape(dims)

    cells = decode(grid.find("./Topology/DataItem")).astype(np.int64)
    points = decode(grid.find("./Geometry/DataItem"))
    point_data: dict[str, np.ndarray] = {}
    cell_data: dict[str, np.ndarray] = {}
    for attr in grid.findall("./Attribute"):
        arr = decode(attr.find("./DataItem"))
        target = point_data if attr.get("Center") == "Node" else cell_data
        target[attr.get("Name")] = arr
    return points, cells, point_data, cell_data
