"""Pallas TPU kernel for the CSR assembly write path.

Replaces the role of PETSc's ``MatSetValues`` insertion loop in the
reference (reference ``assembly.py:355-357`` drives per-cell C kernels that
scatter element matrices into an AIJ matrix): here the sparsity pattern is
STATIC (host-precomputed once per mesh/degree), so assembly is a
permute + segment-sum of the batched element-matrix values into unique CSR
slots.  The kernel processes one chunk of output slots per grid step,
loading its (precomputed, scalar-prefetched) window of sorted input values
and folding duplicates with a masked compare-and-reduce on the VPU — no
TPU scatter (which serializes) anywhere.

A ``jax.ops.segment_sum`` fallback provides the same contract off-TPU; the
kernel also runs in interpreter mode for CPU testing.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["CSRPattern", "build_csr_pattern", "make_csr_assembler"]


class CSRPattern:
    """Static CSR sparsity + duplicate-folding plan for a COO stream.

    Attributes:
        indptr: (nrows+1,) CSR row pointers.
        indices: (nnz,) CSR column indices.
        perm: (nraw,) permutation sorting the raw COO stream by (row, col).
        segment_ids: (nraw,) unique-slot id of each sorted raw entry.
        shape: Matrix shape.
    """

    def __init__(self, rows: np.ndarray, cols: np.ndarray, shape: tuple[int, int]):
        nraw = rows.shape[0]
        order = np.lexsort((cols, rows))
        r_sorted, c_sorted = rows[order], cols[order]
        new_slot = np.empty(nraw, dtype=bool)
        new_slot[0] = True
        new_slot[1:] = (r_sorted[1:] != r_sorted[:-1]) | (c_sorted[1:] != c_sorted[:-1])
        segment_ids = np.cumsum(new_slot) - 1
        nnz = int(segment_ids[-1]) + 1
        u_rows = r_sorted[new_slot]
        u_cols = c_sorted[new_slot]
        indptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, u_rows + 1, 1)
        np.cumsum(indptr, out=indptr)

        self.shape = shape
        self.perm = order.astype(np.int32)
        self.segment_ids = segment_ids.astype(np.int32)
        self.indptr = indptr
        self.indices = u_cols.astype(np.int32)
        self.nnz = nnz
        self.nraw = nraw


def build_csr_pattern(rows: np.ndarray, cols: np.ndarray, shape) -> CSRPattern:
    return CSRPattern(np.asarray(rows), np.asarray(cols), tuple(shape))


def _segment_sum_fallback(pattern: CSRPattern):
    perm = jnp.asarray(pattern.perm)
    seg = jnp.asarray(pattern.segment_ids)
    nnz = pattern.nnz

    def assemble(values: jnp.ndarray) -> jnp.ndarray:
        return jax.ops.segment_sum(
            values[perm], seg, num_segments=nnz, indices_are_sorted=True
        )

    return assemble


def make_gather_assembler(pattern: CSRPattern):
    """Exact float64 duplicate folding with NO scatter: each CSR slot gathers
    its (boundedly many) duplicate contributions through a host-precomputed
    ``(nnz, max_dup)`` index matrix and reduces along the short axis.
    Gathers vectorize on TPU where scatters serialize; f64 stays exact
    (Mosaic kernels are f32-only, XLA handles the f64 reduce)."""
    nnz, nraw = pattern.nnz, pattern.nraw
    counts = np.bincount(pattern.segment_ids, minlength=nnz)
    max_dup = int(counts.max()) if nnz else 1
    offsets = np.concatenate([[0], np.cumsum(counts)])
    idx = np.minimum(
        offsets[:-1, None] + np.arange(max_dup)[None, :], nraw
    )  # out-of-range rows point at a zero pad slot
    mask = np.arange(max_dup)[None, :] < counts[:, None]
    idx = np.where(mask, idx, nraw)

    perm = jnp.asarray(pattern.perm)
    idx_dev = jnp.asarray(idx)

    def assemble(values: jnp.ndarray) -> jnp.ndarray:
        sorted_vals = jnp.concatenate(
            [values[perm], jnp.zeros(1, dtype=values.dtype)]
        )
        return jnp.sum(sorted_vals[idx_dev], axis=1)

    return assemble


def make_csr_assembler(
    pattern: CSRPattern,
    block: int = 512,
    method: str = "auto",
    interpret: bool = False,
):
    """Build ``assemble(values) -> csr_data`` for a fixed sparsity pattern.

    Methods:
        ``"gather"``  — exact f64 gather-matrix fold (default on every
            backend; scatter-free, TPU-friendly).
        ``"pallas"``  — Mosaic kernel, float32 (Mosaic has no f64): DMA'd
            input windows + masked compare-reduce per output chunk.  The
            fast path for f32 assembly (preconditioners, visualisation,
            mixed-precision solves).
        ``"segment"`` — ``jax.ops.segment_sum`` reference implementation.
        ``"auto"``    — gather.

    Args:
        pattern: Static plan from :func:`build_csr_pattern`.
        block: Output slots per kernel sub-chunk (pallas method).
        interpret: Run the pallas kernel in interpreter mode (CPU testing).
    """
    if method == "auto":
        method = "gather"
    if method == "gather":
        return make_gather_assembler(pattern)
    if method == "segment":
        return _segment_sum_fallback(pattern)
    if method != "pallas":
        raise ValueError(f"unknown csr assembler method {method!r}")

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nnz, nraw = pattern.nnz, pattern.nraw
    n_chunks = max(1, -(-nnz // block))
    # TPU sublane tiling wants >= 8 rows per output block: fold 8 chunks
    # into one grid step.
    SUB = 8
    n_super = -(-n_chunks // SUB)
    n_chunks_padded = n_super * SUB

    # Host plan: each output chunk [c*block, (c+1)*block) consumes the
    # contiguous sorted-input range [in_start[c], in_start[c+1]) because
    # segment ids are sorted.  Windows are loaded at a fixed padded width.
    chunk_edges = np.searchsorted(
        pattern.segment_ids, np.arange(n_chunks + 1) * block, side="left"
    ).astype(np.int32)
    widths = np.diff(chunk_edges)
    # The input stream is laid out 2D as (rows, 128) so window DMAs respect
    # the (8, 128) VMEM tiling: windows start on an 8-row (1024-element)
    # boundary and span WROWS rows; the true range [delta, delta+count) is
    # selected by masking in-kernel.
    LANES = 128
    ROW_ALIGN = 8  # rows; 8 * 128 = 1024 elements
    need = int(widths.max()) if n_chunks else 1
    WROWS = ROW_ALIGN * max(1, -(-(need + ROW_ALIGN * LANES) // (ROW_ALIGN * LANES)))
    win = WROWS * LANES

    raw_starts = np.zeros(n_chunks_padded, dtype=np.int64)
    in_counts = np.zeros(n_chunks_padded, dtype=np.int32)
    raw_starts[:n_chunks] = chunk_edges[:-1]
    in_counts[:n_chunks] = widths
    start_rows = ((raw_starts // (ROW_ALIGN * LANES)) * ROW_ALIGN).astype(np.int32)
    in_deltas = (raw_starts - start_rows.astype(np.int64) * LANES).astype(np.int32)

    # Pad the input stream so every window DMA is in bounds, and reshape 2D.
    n_rows_raw = -(-nraw // LANES)
    n_rows = n_rows_raw + WROWS
    pad_to = n_rows * LANES
    seg_padded = np.full(pad_to, -1, dtype=np.int32)
    seg_padded[:nraw] = pattern.segment_ids
    seg2d = seg_padded.reshape(n_rows, LANES)

    def kernel(
        starts_ref, deltas_ref, counts_ref, vals_hbm, seg_hbm, out_ref, *scratch
    ):
        vals_bufs = scratch[:SUB]
        seg_bufs = scratch[SUB : 2 * SUB]
        sems = scratch[2 * SUB]
        s = pl.program_id(0)
        dmas = []
        # Launch all window DMAs up front so transfers overlap compute.
        for r in range(SUB):
            c = s * SUB + r
            row0 = pl.multiple_of(starts_ref[c], ROW_ALIGN)
            v_dma = pltpu.make_async_copy(
                vals_hbm.at[pl.ds(row0, WROWS), :],
                vals_bufs[r],
                sems.at[jnp.int32(2 * r)],
            )
            s_dma = pltpu.make_async_copy(
                seg_hbm.at[pl.ds(row0, WROWS), :],
                seg_bufs[r],
                sems.at[jnp.int32(2 * r + 1)],
            )
            v_dma.start()
            s_dma.start()
            dmas.append((v_dma, s_dma))
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (block, LANES), 1)
        out_ids = jax.lax.broadcasted_iota(jnp.int32, (block, LANES), 0)
        for r in range(SUB):
            c = s * SUB + r
            v_dma, s_dma = dmas[r]
            v_dma.wait()
            s_dma.wait()
            count = counts_ref[c]
            delta = deltas_ref[c]
            base = c * jnp.int32(block)
            acc = jnp.zeros((block, 1), dtype=jnp.float32)
            for row in range(WROWS):
                pos = lane_ids + jnp.int32(row * LANES)
                valid = (pos >= delta) & (pos < delta + count)
                seg_row = jax.lax.broadcast_in_dim(
                    seg_bufs[r][row, :], (block, LANES), (1,)
                )
                onehot = valid & (seg_row == (out_ids + base))
                vals_row = jax.lax.broadcast_in_dim(
                    vals_bufs[r][row, :], (block, LANES), (1,)
                )
                contrib = jnp.where(onehot, vals_row, jnp.float32(0.0))
                acc = acc + jnp.sum(contrib, axis=1, keepdims=True)
            out_ref[r, :] = acc[:, 0]

    perm = jnp.asarray(pattern.perm)
    seg_dev = jnp.asarray(seg2d)
    starts_dev = jnp.asarray(start_rows)
    deltas_dev = jnp.asarray(in_deltas)
    counts_dev = jnp.asarray(in_counts)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (SUB, block), lambda s, *_: (s, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((WROWS, LANES), jnp.float32) for _ in range(SUB)]
            + [pltpu.VMEM((WROWS, LANES), jnp.int32) for _ in range(SUB)]
            + [pltpu.SemaphoreType.DMA((2 * SUB,))]
        ),
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks_padded, block), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    def assemble(values: jnp.ndarray) -> jnp.ndarray:
        vals_sorted = values[perm].astype(jnp.float32)
        vals_padded = jnp.concatenate(
            [vals_sorted, jnp.zeros(pad_to - nraw, dtype=jnp.float32)]
        ).reshape(n_rows, LANES)
        out = call(starts_dev, deltas_dev, counts_dev, vals_padded, seg_dev)
        return out.reshape(-1)[:nnz]

    return assemble
