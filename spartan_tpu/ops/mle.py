"""Dense multilinear-extension (MLE) kernels over batched Fr limbs.

TPU-native equivalent of the reference's ``MLExtensionArray`` (SURVEY.md
§2.2; use sites src/data_structures/r1cs_reader.rs:82 ``eval_binary``,
src/ahp/prover.rs:217 ``eval_at``) and of ``eq_extension``
(src/data_structures/eq.rs:5).

Conventions (must match the reference for transcript parity):
- An nv-variable MLE is its evaluation table over {0,1}^nv, index bit i =
  variable i, variable 0 = least-significant bit (the reference's packing
  ``(y << s) + x``, src/data_structures/r1cs_reader.rs:22).
- Sumcheck folds variable 0 first: fold(t, r)[b] = t[2b] + r*(t[2b+1]-t[2b]).

Memory-layout: tables are (16, N) uint32 Montgomery-form Fr limbs
(limbs-leading; see spartan_tpu.ops.limb).

Design note on eq: the reference materializes eq(t,x) as log n separate
full-cube factors — O(n log n) memory (src/data_structures/eq.rs:8-17,
flagged in SURVEY.md §5 as the memory soft spot). Here eq lives as a single
table plus the ladder of suffix tables (total 2n field elements), which is
all the sumcheck prover needs; the factored form is never materialized.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.ops import field as f
from spartan_tpu.ops.field import FR
from spartan_tpu.ops.limb import U32

__all__ = [
    "fold",
    "eval_at",
    "eval_binary",
    "eq_table",
    "eq_suffix_tables",
    "eq_suffix_tables_mont",
    "sum_mod",
    "scale",
]


@partial(jax.jit, static_argnums=())
def fold(table, r):
    """Fix variable 0 of an MLE table to r: (16, ..., N) -> (16, ..., N//2).

    out[b] = t[2b] + r * (t[2b+1] - t[2b]) (Montgomery mul by r, broadcast).
    Extra middle axes are instance-batch dims (batched proving); the pairing
    stays within each instance because the table axis is minor.
    """
    k = table.shape[0]
    n = table.shape[-1]
    mid = table.shape[1:-1]
    pairs = table.reshape((k,) + mid + (n // 2, 2))
    even = pairs[..., 0]
    odd = pairs[..., 1]
    diff = f.sub(FR, odd, even)
    r_col = r.reshape((k,) + (1,) * (table.ndim - 1))
    return f.add(FR, even, f.mont_mul(FR, diff, r_col))


def eval_at(table, rs):
    """Fully evaluate an MLE at a point: rs is (16, nv) (Montgomery).

    Returns (16, 1). Folds variable 0 first (reference fold order).
    """
    t = table
    nv = rs.shape[1]
    for i in range(nv):
        t = fold(t, rs[:, i])
    return t


def eval_binary(table, idx: int):
    """Table lookup at a boolean point (static index)."""
    return table[:, idx : idx + 1]


def scale(table, s):
    """Multiply every entry by scalar s (16,) or (16,1) (Montgomery)."""
    return f.mont_mul(FR, table, s.reshape(FR.nlimb, 1))


def eq_table(ts):
    """Build the single eq(t, x) table over the full cube.

    ts: (16, nv) Montgomery point. Returns (16, 2^nv) with
    out[x] = prod_i (t_i x_i + (1-t_i)(1-x_i)), variable 0 = LSB.
    """
    k = FR.nlimb
    one = f.ones_mont(FR, (1,))
    table = one  # (16, 1)
    nv = ts.shape[1]
    for i in range(nv):
        ti = ts[:, i : i + 1]
        one_minus_ti = f.sub(FR, one, ti)
        hi = f.mont_mul(FR, table, ti)  # x_i = 1 branch
        lo = f.mont_mul(FR, table, one_minus_ti)  # x_i = 0 branch
        # new index: x + 2^i * b  ->  bit i (the NEW variable) is the
        # most-significant bit so far: stack blocks [lo | hi]
        table = jnp.concatenate([lo, hi], axis=1)
    return table


def eq_suffix_tables(ts_ints):
    """All suffix eq tables: S[j] = eq table of ts[j:], for j = 0..nv.

    ts_ints: list of nv Python ints (the verifier point, e.g. tor).
    Returns list of (16, 2^(nv-j)) arrays; S[nv] is the constant-1 table.
    Total memory = 2 * 2^nv field elements.

    S[j]'s variable 0 (LSB) corresponds to ts[j] — i.e. the first
    still-unfixed sumcheck variable, matching the fold order.
    """
    return eq_suffix_tables_mont(f.encode_mont(FR, ts_ints))


def eq_suffix_tables_mont(ts_mont):
    """eq_suffix_tables for a traced (16, nv) Montgomery point (jit-safe)."""
    nv = ts_mont.shape[1]
    tables = [None] * (nv + 1)
    tables[nv] = f.ones_mont(FR, (1,))
    for j in range(nv - 1, -1, -1):
        tj = ts_mont[:, j : j + 1]  # (16, 1)
        one = f.ones_mont(FR, (1,))
        one_minus = f.sub(FR, one, tj)
        nxt = tables[j + 1]  # (16, M)
        lo = f.mont_mul(FR, nxt, one_minus)  # b=0 branch (bit 0 of new index)
        hi = f.mont_mul(FR, nxt, tj)
        # index v = b + 2*x -> b is LSB: interleave lo/hi
        m = nxt.shape[1]
        stacked = jnp.stack([lo, hi], axis=2)  # (16, M, 2)
        tables[j] = stacked.reshape(FR.nlimb, 2 * m)
    return tables


def sum_mod(table):
    """Sum a table's last axis mod r: (16, ..., N) -> (16, ..., 1) canonical.

    Limb-wise u32 tree reduction in chunks small enough to never overflow
    (chunk <= 2^12 terms of 16-bit limbs < 2^28), with a wide modular
    reduction between stages.
    """
    t = table
    while t.shape[-1] > 1:
        n = t.shape[-1]
        lead = t.shape[:-1]
        chunk = min(4096, n)
        g = n // chunk
        if g * chunk != n:
            # pad with zeros to a multiple (zeros don't change the sum)
            pad = g * chunk + chunk - n
            t = jnp.concatenate(
                [t, jnp.zeros(lead + (pad,), U32)], axis=-1
            )
            g += 1
        acc = t.reshape(lead + (g, chunk)).sum(axis=-1, dtype=U32)
        t = f.reduce_wide(FR, acc)  # (16, ..., g) canonical
    return t
