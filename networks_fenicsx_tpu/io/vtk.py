"""Minimal VTK XML (VTU) writer for network meshes.

Host-side replacement for the reference's ADIOS2 VTXWriter / XDMF output
(reference ``post_processing.py:55-97`` via ``dolfinx.io``): solutions and
meshes are written as ASCII ``.vtu`` unstructured-grid files (ParaView
compatible) from gathered host arrays.  The reference's ``.bp``/ADIOS2
backend has no TPU-side counterpart here; VTU is the equivalent
visualisation path (SURVEY §2b row N8).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import numpy.typing as npt

__all__ = ["write_vtu", "VTK_VERTEX", "VTK_LINE"]

VTK_VERTEX = 1
VTK_LINE = 3


def _fmt_array(a: np.ndarray) -> str:
    flat = np.asarray(a).ravel()
    if flat.dtype.kind in "iu":
        return " ".join(str(int(v)) for v in flat)
    return " ".join(f"{float(v):.16g}" for v in flat)


def write_vtu(
    path: str | Path,
    points: npt.NDArray[np.floating],
    cells: npt.NDArray[np.integer],
    cell_type: int = VTK_LINE,
    point_data: dict[str, npt.NDArray] | None = None,
    cell_data: dict[str, npt.NDArray] | None = None,
) -> Path:
    """Write an unstructured grid of uniform cell type to a ``.vtu`` file.

    Args:
        path: Output file (parent directories are created).
        points: (n_pts, gdim) coordinates; padded to 3D as VTK requires.
        cells: (n_cells, nodes_per_cell) connectivity.
        cell_type: VTK cell type id (1 = vertex, 3 = line).
        point_data / cell_data: Named scalar or vector arrays.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    points = np.asarray(points, dtype=np.float64)
    pts3 = np.zeros((points.shape[0], 3))
    pts3[:, : points.shape[1]] = points
    cells = np.asarray(cells, dtype=np.int64)
    if cells.ndim == 1:
        cells = cells.reshape(-1, 1)
    n_cells, npc = (cells.shape[0], cells.shape[1]) if cells.size else (0, 1)

    def _data_arrays(data: dict[str, npt.NDArray] | None) -> str:
        if not data:
            return ""
        parts = []
        for name, arr in data.items():
            arr = np.asarray(arr)
            ncomp = 1 if arr.ndim == 1 else arr.shape[1]
            parts.append(
                f'<DataArray type="Float64" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n'
                f"{_fmt_array(arr.astype(np.float64))}\n</DataArray>"
            )
        return "\n".join(parts)

    offsets = npc * np.arange(1, n_cells + 1, dtype=np.int64)
    types = np.full(n_cells, cell_type, dtype=np.int64)

    xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
<UnstructuredGrid>
<Piece NumberOfPoints="{points.shape[0]}" NumberOfCells="{n_cells}">
<Points>
<DataArray type="Float64" NumberOfComponents="3" format="ascii">
{_fmt_array(pts3)}
</DataArray>
</Points>
<Cells>
<DataArray type="Int64" Name="connectivity" format="ascii">
{_fmt_array(cells)}
</DataArray>
<DataArray type="Int64" Name="offsets" format="ascii">
{_fmt_array(offsets)}
</DataArray>
<DataArray type="Int64" Name="types" format="ascii">
{_fmt_array(types)}
</DataArray>
</Cells>
<PointData>
{_data_arrays(point_data)}
</PointData>
<CellData>
{_data_arrays(cell_data)}
</CellData>
</Piece>
</UnstructuredGrid>
</VTKFile>
"""
    path.write_text(xml)
    return path
