"""IO backends: VTU/PVD, XDMF/HDF5, checkpoint, ADIOS2 VTX ``.bp``."""

from . import bp, vtk
from .vtk import write_vtu

__all__ = ["bp", "vtk", "write_vtu"]
