"""Solution checkpointing (save/restore of solve state).

The reference has no checkpoint/resume — its closest artifacts are the VTX
solution exports (reference ``post_processing.py:55-78``, SURVEY §5).  Here
solutions round-trip losslessly: all solution blocks plus enough mesh/space
metadata to validate compatibility are stored in a single ``.npz``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..assembly import HydraulicNetworkAssembler
from ..function import NetworkFunction

__all__ = ["save_solution", "load_solution"]

_FORMAT_VERSION = 1


def _fingerprint(asm: HydraulicNetworkAssembler) -> np.ndarray:
    mesh = asm.network
    return np.array(
        [
            _FORMAT_VERSION,
            mesh.num_edges,
            mesh.N,
            mesh.num_edge_colors,
            mesh.num_multipliers,
            asm.flux_degree,
            asm.pressure_degree,
            asm.num_dofs,
        ],
        dtype=np.int64,
    )


def save_solution(
    path: str | Path,
    assembler: HydraulicNetworkAssembler,
    functions: list[NetworkFunction],
) -> Path:
    """Save a solution (the function list returned by ``Solver.solve``)."""
    path = Path(path)
    if path.suffix != ".npz":
        # np.savez appends '.npz' to suffix-less names; normalise up front
        # so the returned Path is the file actually written.
        path = path.with_suffix(path.suffix + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {
        "fingerprint": _fingerprint(assembler),
        "names": np.array([fn.name for fn in functions]),
    }
    for i, fn in enumerate(functions):
        arrays[f"block_{i}"] = np.asarray(fn.values)
    np.savez_compressed(path, **arrays)
    return path


def load_solution(
    path: str | Path,
    assembler: HydraulicNetworkAssembler,
) -> list[NetworkFunction]:
    """Restore a solution into fresh functions for the given assembler.

    Raises if the checkpoint was written for an incompatible
    mesh/discretisation (different edges, N, degrees or dof count).
    """
    with np.load(Path(path), allow_pickle=False) as data:
        fp = data["fingerprint"]
        if not np.array_equal(fp, _fingerprint(assembler)):
            raise ValueError(
                "checkpoint is incompatible with this assembler "
                f"(stored {fp.tolist()}, expected {_fingerprint(assembler).tolist()})"
            )
        names = [str(n) for n in data["names"]]
        functions = []
        for i, (space, name) in enumerate(zip(assembler.function_spaces, names)):
            functions.append(NetworkFunction(space, data[f"block_{i}"], name=name))
    return functions
