"""Minimal XDMF writer with inline (XML) data for 1D network meshes.

Parity companion to the reference's XDMF submesh export
(reference ``post_processing.py:81-97`` via ``dolfinx.io.XDMFFile``):
polyline topology + XYZ geometry + named vertex/cell attributes, readable
by ParaView.  Data is embedded inline (no HDF5 dependency in this image).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import numpy.typing as npt

__all__ = ["write_xdmf"]


def _item(a: np.ndarray, per_line: int) -> str:
    flat = np.asarray(a).reshape(-1, per_line)
    if flat.dtype.kind in "iu":
        body = "\n".join(" ".join(str(int(v)) for v in row) for row in flat)
        dtype = 'DataType="Int" Precision="8"'
    else:
        body = "\n".join(" ".join(f"{float(v):.16g}" for v in row) for row in flat)
        dtype = 'DataType="Float" Precision="8"'
    dims = f'{flat.shape[0]} {flat.shape[1]}' if per_line > 1 else f"{flat.size}"
    return f'<DataItem Dimensions="{dims}" {dtype} Format="XML">\n{body}\n</DataItem>'


def write_xdmf(
    path: str | Path,
    points: npt.NDArray[np.floating],
    cells: npt.NDArray[np.integer],
    point_data: dict[str, npt.NDArray] | None = None,
    cell_data: dict[str, npt.NDArray] | None = None,
    grid_name: str = "mesh",
) -> Path:
    """Write a polyline grid with attributes to an ``.xdmf`` file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    points = np.asarray(points, dtype=np.float64)
    pts3 = np.zeros((points.shape[0], 3))
    pts3[:, : points.shape[1]] = points
    cells = np.asarray(cells, dtype=np.int64).reshape(-1, 2)

    attrs = []
    for name, arr in (point_data or {}).items():
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="Scalar" Center="Node">\n'
            f"{_item(np.asarray(arr, dtype=np.float64), 1)}\n</Attribute>"
        )
    for name, arr in (cell_data or {}).items():
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="Scalar" Center="Cell">\n'
            f"{_item(np.asarray(arr, dtype=np.float64), 1)}\n</Attribute>"
        )
    attr_block = "\n".join(attrs)

    xml = f"""<?xml version="1.0"?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0">
<Domain>
<Grid Name="{grid_name}" GridType="Uniform">
<Topology TopologyType="Polyline" NodesPerElement="2" NumberOfElements="{cells.shape[0]}">
{_item(cells, 2)}
</Topology>
<Geometry GeometryType="XYZ">
{_item(pts3, 3)}
</Geometry>
{attr_block}
</Grid>
</Domain>
</Xdmf>
"""
    path.write_text(xml)
    return path
