"""IO backends (VTU writer)."""

from . import vtk
from .vtk import write_vtu

__all__ = ["vtk", "write_vtu"]
