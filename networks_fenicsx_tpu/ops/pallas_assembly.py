"""Deprecated alias for :mod:`networks_fenicsx_tpu.ops.csr_assembly`.

This module once also carried a Pallas CSR fold kernel; it was removed in
round 2 because compiled Mosaic kernels cannot be validated on this
build's remote-compile TPU tunnel (one attempt wedged the device for ~10
minutes), and shipping a hardware-untested kernel is worse than not
shipping one.  The exact-f64 gather-fold assembler that owns the measured
path lives in :mod:`.csr_assembly`; revisit a real Mosaic kernel only with
a directly-attached chip to validate against.
"""

from .csr_assembly import CSRPattern, build_csr_pattern, make_csr_assembler

__all__ = ["CSRPattern", "build_csr_pattern", "make_csr_assembler"]
