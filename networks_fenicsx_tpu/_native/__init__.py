"""ctypes bindings for the native (C++) host-side graph preprocessing.

The shared library is built from ``native/netgraph.cpp`` (see
``native/build.sh``); if it is absent and a compiler is available it is
built on first import, and every entry point falls back to pure
NumPy/Python when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["color_edges", "degrees", "available"]

_LIB_PATH = Path(__file__).parent / "libnetgraph.so"
_SRC_PATH = Path(__file__).parent.parent.parent / "native" / "netgraph.cpp"
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and _SRC_PATH.exists():
        try:
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-shared",
                    "-fPIC",
                    "-std=c++17",
                    "-o",
                    str(_LIB_PATH),
                    str(_SRC_PATH),
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.nxfx_color_edges.restype = ctypes.c_int32
        lib.nxfx_color_edges.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nxfx_degrees.restype = None
        lib.nxfx_degrees.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def color_edges(edges: np.ndarray, num_nodes: int) -> np.ndarray | None:
    """Greedy proper edge coloring via the native library.

    Args:
        edges: (E, 2) int64 node-id pairs.
        num_nodes: Number of nodes (ids in [0, num_nodes)).

    Returns:
        (E,) int32 colors, or None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, dtype=np.int64)
    colors = np.empty(edges.shape[0], dtype=np.int32)
    ncolors = lib.nxfx_color_edges(
        edges.shape[0],
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(num_nodes),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if ncolors < 0:
        return None
    return colors


def degrees(edges: np.ndarray, num_nodes: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, dtype=np.int64)
    out = np.empty(int(num_nodes), dtype=np.int64)
    lib.nxfx_degrees(
        edges.shape[0],
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(num_nodes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
