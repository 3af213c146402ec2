"""Numerical kernels: closed-form interval elements and Krylov solvers."""

from . import elements, krylov

__all__ = ["elements", "krylov"]
