"""Post-processing: global flux extraction and file export.

Capability match for the reference (``src/networks_fenicsx/post_processing.py``):

* :func:`extract_global_flux` — merge the per-color submesh flux solutions
  into one discontinuous flux field on the parent mesh (the reference
  interpolates submesh functions cell-by-cell through entity maps,
  ``post_processing.py:19-52``; here it is a single gather/scatter since
  flux dofs are already laid out per cell).
* :func:`export_functions` — write every flux, the pressure and the
  multiplier field to disk (reference writes ADIOS2 ``.bp``,
  ``post_processing.py:55-78``; here ParaView-compatible ``.vtu``).
* :func:`export_submeshes` — write each color submesh with its inherited
  vertex markers (reference XDMF, ``post_processing.py:81-97``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .function import FunctionSpace, NetworkFunction, _edge_major_dof_coords
from .io.vtk import VTK_LINE, VTK_VERTEX, write_pvd, write_vtu
from .mesh import NetworkMesh

__all__ = [
    "extract_global_flux",
    "export_functions",
    "export_submeshes",
    "TimeSeriesWriter",
]


def extract_global_flux(
    graph_mesh: NetworkMesh, functions: list[NetworkFunction]
) -> NetworkFunction:
    """Merge per-color flux solutions into one parent-mesh DG field.

    Args:
        graph_mesh: The network mesh.
        functions: Solution list ``[flux_0, ..., flux_{M-1}, pressure, lm]``
            (the reference contract, ``post_processing.py:19-26``).

    Returns:
        A :class:`NetworkFunction` named ``"Global_Flux"`` whose values are
        organised per parent cell, ``(num_cells, degree + 1)`` flattened, in
        along-edge local order.
    """
    flux_functions = functions[:-2]
    degree = flux_functions[0].space.degree
    N = graph_mesh.N
    C = graph_mesh.num_cells
    global_vals = np.zeros((C, degree + 1), dtype=np.float64)
    for i, flux in enumerate(flux_functions):
        flux.name = f"Flux_{i}"
        view = graph_mesh.submeshes[flux.space.color]
        cell_vals = flux.cell_dof_values()  # (len(view.cell_indices), k+1)
        global_vals[view.cell_indices] = cell_vals
    space = FunctionSpace(graph_mesh, "dg", degree, None, C * (degree + 1))
    return NetworkFunction(space, global_vals.reshape(-1), name="Global_Flux")


def _write_flux_function(fn: NetworkFunction, path: Path, writer=write_vtu) -> None:
    """Write a per-color flux function as polyline VTU with point data."""
    mesh = fn.space.mesh
    view = mesh.submeshes[fn.space.color]
    k, N = fn.space.degree, mesh.N
    n_dofs = k * N + 1
    coords = _edge_major_dof_coords(mesh, view.edge_ids, k)
    n_edges = view.edge_ids.size
    # one line segment between consecutive dof points along each edge
    base = n_dofs * np.arange(n_edges)[:, None, None]
    seg = np.stack(
        [np.arange(n_dofs - 1), np.arange(1, n_dofs)], axis=-1
    )[None, :, :]
    cells = (base + seg).reshape(-1, 2)
    writer(path, coords, cells, VTK_LINE, point_data={fn.name or "flux": fn.values})


def _write_blocks(
    functions: list[NetworkFunction],
    export_path: Path,
    suffix: str = "",
    format: str = "vtu",
    time: float = 0.0,
) -> dict[str, str]:
    """Write one frame of every solution block; returns the series→file map
    (file names relative to ``export_path``)."""
    if format == "bp":
        import functools

        from .io.bp import write_bp

        writer = functools.partial(write_bp, time=time)
        ext = ".bp"
    elif format == "vtu":
        writer = write_vtu
        ext = ".vtu"
    else:
        raise ValueError(f"unknown export format {format!r} (vtu or bp)")
    written: dict[str, str] = {}
    flux_functions = functions[:-2]
    for i, q in enumerate(flux_functions):
        fname = f"flux_{i}{suffix}{ext}"
        _write_flux_function(q, export_path / fname, writer=writer)
        written[f"flux_{i}"] = fname

    pressure = functions[-2]
    mesh = pressure.space.mesh
    fname = f"pressure{suffix}{ext}"
    # Parent mesh as line cells in stored vertex order.
    if pressure.space.degree == 0:
        writer(
            export_path / fname,
            mesh.vertices,
            mesh.cells,
            VTK_LINE,
            cell_data={"pressure": pressure.values},
        )
    else:
        # Vertex dofs lead the dof layout, so the vertex slice of the value
        # array pairs with mesh.vertices; writing dof_coordinates() here
        # would leave NumberOfPoints > len(PointData), which VTK rejects.
        writer(
            export_path / fname,
            mesh.vertices[:],
            mesh.cells,
            VTK_LINE,
            point_data={"pressure": pressure.values[: mesh.num_vertices]},
        )
    written["pressure"] = fname

    lm = functions[-1]
    lm_coords = lm.space.dof_coordinates()
    fname = f"lm{suffix}{ext}"
    writer(
        export_path / fname,
        lm_coords,
        np.arange(lm_coords.shape[0], dtype=np.int64).reshape(-1, 1),
        VTK_VERTEX,
        point_data={"global_flux": lm.values},
    )
    written["lm"] = fname
    return written


def export_functions(
    functions: list[NetworkFunction],
    outpath: Path | str,
    time: float | None = None,
    format: str = "vtu",
) -> None:
    """Export every solution block (reference ``post_processing.py:55-78``).

    Writes ``flux_<i>.vtu`` per color, ``pressure.vtu`` (cell data for DG0,
    point data otherwise) and ``lm.vtu`` (bifurcation point cloud).

    Args:
        time: When given, wraps each block in a single-frame ParaView
            ``.pvd`` collection stamped with this time (the reference's
            ``vtx.write(0.0)``).  For multi-frame series use
            :class:`TimeSeriesWriter`.
        format: ``"vtu"`` (default) or ``"bp"`` — ADIOS2 VTX datasets
            matching the reference's ``VTXWriter`` output names
            (``flux_<i>.bp``, ``pressure.bp``, ``lm.bp``); needs the
            ``adios2`` bindings (:mod:`networks_fenicsx_tpu.io.bp`).
    """
    export_path = Path(outpath)
    written = _write_blocks(
        functions, export_path, format=format, time=time or 0.0
    )
    if time is not None and format == "vtu":
        for series, fname in written.items():
            write_pvd(export_path / f"{series}.pvd", [(time, fname)])


class TimeSeriesWriter:
    """Transient solution export: per-block frame ``.vtu`` files plus
    ParaView ``.pvd`` time collections.

    Functional parity for the reference's timestamped ADIOS2 writers
    (reference ``post_processing.py:55-78``: one ``VTXWriter`` per block,
    ``vtx.write(t)`` per step; here one ``.pvd`` per block referencing the
    frames).  Usage::

        writer = TimeSeriesWriter(outdir)
        for t in times:
            ...update coefficients, solve...
            writer.write(functions, t)

    The ``.pvd`` files are rewritten after every frame, so the series is
    valid (and openable in ParaView) even mid-run.
    """

    def __init__(self, outpath: Path | str):
        self._path = Path(outpath)
        self._frames: list[tuple[float, dict[str, str]]] = []

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    def write(self, functions: list[NetworkFunction], t: float) -> None:
        """Write one frame of every solution block at time ``t``."""
        suffix = f"_{len(self._frames):06d}"
        written = _write_blocks(functions, self._path, suffix)
        self._frames.append((float(t), written))
        series = written.keys()
        for name in series:
            write_pvd(
                self._path / f"{name}.pvd",
                [(t_i, files[name]) for t_i, files in self._frames],
            )


def export_submeshes(
    network_mesh: NetworkMesh, outpath: str | Path, format: str = "xdmf",
    fmt: str = "auto",
) -> None:
    """Export each color submesh with its vertex markers
    (reference ``post_processing.py:81-97``; the reference writes XDMF with
    HDF5-backed heavy data).

    Args:
        format: ``"xdmf"`` (reference-parity) or ``"vtu"``.
        fmt: XDMF data placement — ``"auto"`` (HDF5 sidecar once the grid is
            large, like the reference's ``XDMFFile``), ``"hdf5"`` or ``"xml"``
            (inline, self-contained).
    """
    from .io.xdmf import write_xdmf

    outpath = Path(outpath)
    for i, view in enumerate(network_mesh.submeshes):
        coords = network_mesh.vertices[view.vertex_indices]
        markers = np.full(coords.shape[0], -1.0)
        markers[view.facet_markers.indices] = view.facet_markers.values
        if format == "xdmf":
            write_xdmf(
                outpath / f"submesh_{i}.xdmf",
                coords,
                view.cells,
                point_data={"vertex_markers": markers},
                grid_name=f"submesh_{i}",
                fmt=fmt,
            )
        else:
            write_vtu(
                outpath / f"submesh_{i}.vtu",
                coords,
                view.cells,
                VTK_LINE,
                point_data={"vertex_markers": markers},
            )
