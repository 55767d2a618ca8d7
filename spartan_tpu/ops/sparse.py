"""Sparse R1CS-matrix kernels: gather + Montgomery-mul + segment-sum.

TPU-native equivalent of the reference's sparse matrix walks
(``MatrixExtension::sum_over_y``, src/data_structures/r1cs_reader.rs:75-85,
and ``eval_on_x`` via ``SparseMLExtensionMap::eval_partial_at``,
r1cs_reader.rs:91-117). The reference iterates rows with scalar dot
products; here the matrix is one flat COO triple (rows, cols, vals) and both
operations are the same data-parallel kernel:

    out[s] = sum over nnz entries with scatter-index s of  val * table[gather-index]

- ``sum_over_y``:  gather = col (z values),   scatter = row
- ``eval_on_x``:   gather = row (eq(r_x, .)), scatter = col

The segment sum is limb-wise uint32 (safe for < 2^16 entries per segment)
followed by one wide modular reduction. Segments denser than that — e.g.
the synthesizer's dense square constraint, whose row holds ~n entries
(models/synthesizer.py, reference constraints.rs:52-60) — use a two-stage
sum: the indexer precomputes sub-segment ids splitting each segment into
<= 2^15-entry chunks (``dense_segment_aux``), stage 1 segment-sums chunks
and reduces them to single Montgomery values, stage 2 segment-sums the
per-chunk partials (< 2^16 per segment up to 2^31 entries/segment — the
cap ``models/r1cs.validate_matrix`` enforces).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.ops import field as f
from spartan_tpu.ops.field import FR

__all__ = [
    "gather_mul_segsum",
    "gather_mul_segsum_2stage",
    "dense_segment_aux",
    "sum_over_y",
    "eval_on_x_table",
]

# stage-1 chunk size for dense segments; 2^15 keeps the uint32 limb
# accumulator at < 2^31 and the stage-2 fan-in at < 2^16 up to 2^31 nnz
_DENSE_CHUNK = 1 << 15


def dense_segment_aux(scatter, limit: int = _DENSE_CHUNK):
    """Host-side sub-segment structure for segments with >= 2^16 entries.

    scatter: host int sequence of per-entry segment ids. Returns None when
    every segment fits the one-stage kernel, else (sub_idx (nnz,) int32,
    sub_to_seg (n_sub,) int32): entries of each segment are split into
    chunks of <= limit entries; ``gather_mul_segsum_2stage`` consumes this.
    """
    sc = np.asarray(scatter, np.int64)
    if sc.size == 0 or np.bincount(sc).max() < (1 << 16):
        return None
    order = np.argsort(sc, kind="stable")
    s_sorted = sc[order]
    seg_break = np.r_[True, s_sorted[1:] != s_sorted[:-1]]
    seg_starts = np.flatnonzero(seg_break)
    seg_sizes = np.diff(np.r_[seg_starts, sc.size])
    pos_in_seg = np.arange(sc.size) - np.repeat(seg_starts, seg_sizes)
    chunk = pos_in_seg // limit
    new_sub = seg_break | np.r_[False, chunk[1:] != chunk[:-1]]
    sub_sorted = np.cumsum(new_sub) - 1
    sub_idx = np.empty(sc.size, np.int32)
    sub_idx[order] = sub_sorted.astype(np.int32)
    sub_to_seg = s_sorted[new_sub].astype(np.int32)
    return sub_idx, sub_to_seg


@partial(jax.jit, static_argnums=(4,))
def gather_mul_segsum(gather_idx, scatter_idx, vals, table, n_out: int):
    """out[s] = sum_{e: scatter_idx[e]=s} vals[e] * table[gather_idx[e]].

    gather_idx, scatter_idx: (nnz,) int32; vals: (16, nnz) Montgomery;
    table: (16, N) Montgomery. Returns (16, n_out) canonical Montgomery.
    """
    gathered = jnp.take(table, gather_idx, axis=1)  # (16, nnz)
    prods = f.mont_mul(FR, vals, gathered)  # (16, nnz), limbs < 2^16
    # limb-wise segment sum: (nnz, 16) data, sum over entries per segment
    acc = jax.ops.segment_sum(
        prods.T, scatter_idx, num_segments=n_out
    )  # (n_out, 16) uint32, values < 2^16 * seg_size
    return f.reduce_wide(FR, acc.T)


@partial(jax.jit, static_argnums=(5, 6))
def gather_mul_segsum_2stage(
    gather_idx, sub_idx, sub_to_seg, vals, table, n_sub: int, n_out: int
):
    """gather_mul_segsum for segments beyond the 2^16-entry accumulator cap.

    sub_idx / sub_to_seg: precomputed by ``dense_segment_aux``. Stage 1
    sums <= 2^15-entry chunks and reduces each to one Montgomery value;
    stage 2 sums the per-chunk partials per real segment (< 2^16 of them
    for any segment below the 2^31-entry cap).
    """
    gathered = jnp.take(table, gather_idx, axis=1)  # (16, nnz)
    prods = f.mont_mul(FR, vals, gathered)
    acc = jax.ops.segment_sum(prods.T, sub_idx, num_segments=n_sub)
    partials = f.reduce_wide(FR, acc.T)  # (16, n_sub), limbs < 2^16
    acc2 = jax.ops.segment_sum(partials.T, sub_to_seg, num_segments=n_out)
    return f.reduce_wide(FR, acc2.T)


def _dispatch(gather_idx, scatter_idx, aux, vals, table, n_out: int):
    """One- or two-stage kernel, chosen statically by the indexer's aux."""
    if aux is None:
        return gather_mul_segsum(gather_idx, scatter_idx, vals, table, n_out)
    sub_idx, sub_to_seg = aux
    return gather_mul_segsum_2stage(
        gather_idx, sub_idx, sub_to_seg, vals, table,
        int(sub_to_seg.shape[0]), n_out,
    )


def sum_over_y(coo, z, n: int):
    """Table x -> sum_y M[x,y] * z[y]  (reference r1cs_reader.rs:75-85).

    coo: (rows, cols, vals) or the indexer's extended
    (rows, cols, vals, row_aux, col_aux)."""
    rows, cols, vals = coo[0], coo[1], coo[2]
    aux = coo[3] if len(coo) > 3 else None
    return _dispatch(cols, rows, aux, vals, z, n)


def eval_on_x_table(coo, eqx, n: int):
    """Table y -> M(r_x, y) = sum_x M[x,y] * eq(r_x, x)
    (reference r1cs_reader.rs:91-117, rebuilt as gather/segment-sum)."""
    rows, cols, vals = coo[0], coo[1], coo[2]
    aux = coo[4] if len(coo) > 4 else None
    return _dispatch(rows, cols, aux, vals, eqx, n)
