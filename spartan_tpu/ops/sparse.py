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

The segment sum is limb-wise uint32 (safe for < 2^16 entries per segment,
enforced at indexing time) followed by one wide modular reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from spartan_tpu.ops import field as f
from spartan_tpu.ops.field import FR

__all__ = ["gather_mul_segsum", "sum_over_y", "eval_on_x_table"]


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


def sum_over_y(coo, z, n: int):
    """Table x -> sum_y M[x,y] * z[y]  (reference r1cs_reader.rs:75-85)."""
    rows, cols, vals = coo
    return gather_mul_segsum(cols, rows, vals, z, n)


def eval_on_x_table(coo, eqx, n: int):
    """Table y -> M(r_x, y) = sum_x M[x,y] * eq(r_x, x)
    (reference r1cs_reader.rs:91-117, rebuilt as gather/segment-sum)."""
    rows, cols, vals = coo
    return gather_mul_segsum(rows, cols, vals, eqx, n)
