"""Device-resident CSR matrix with static sparsity.

The on-device counterpart of the reference's PETSc AIJ storage
(reference ``assembly.py:352-357``): structure (indptr/indices) is fixed
per mesh/degree on the host; only values are recomputed, via the CSR
assembly plans in :mod:`networks_fenicsx_tpu.ops.csr_assembly`.
Matrix–vector products are gather + segment-sum (scatter-free).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["CSRMatrix"]


@dataclasses.dataclass
class CSRMatrix:
    data: jnp.ndarray  # (nnz,)
    indices: np.ndarray  # (nnz,) column ids (host, static)
    indptr: np.ndarray  # (nrows+1,) (host, static)
    shape: tuple[int, int]

    def __post_init__(self) -> None:
        counts = np.diff(self.indptr)
        self._row_ids = jnp.asarray(
            np.repeat(np.arange(self.shape[0]), counts).astype(np.int32)
        )
        self._col_ids = jnp.asarray(np.asarray(self.indices, dtype=np.int32))

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    def __matmul__(self, v: jnp.ndarray) -> jnp.ndarray:
        return jax.ops.segment_sum(
            self.data * v[self._col_ids],
            self._row_ids,
            num_segments=self.shape[0],
            indices_are_sorted=True,
        )

    def todense(self) -> jnp.ndarray:
        out = jnp.zeros(self.shape, dtype=self.data.dtype)
        return out.at[self._row_ids, self._col_ids].add(self.data)

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix(
            (np.asarray(self.data), np.asarray(self.indices), np.asarray(self.indptr)),
            shape=self.shape,
        )
