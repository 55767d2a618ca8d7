"""Pallas TPU kernels for batched prime-field arithmetic.

The jnp limb implementation in ops/field.py lowers each Montgomery multiply
to ~50 HLO ops with fori_loops and dynamic-slice accumulator updates; on TPU
that structure round-trips the accumulator through memory every limb step and
measured ~9M Fr muls/s — ~100x off the VPU integer roofline. These kernels
run the whole schoolbook product + Montgomery reduction + carry + conditional
subtract in one fused kernel over VMEM blocks, with the limb loops fully
unrolled in-kernel (static K = 16 or 24 iterations over (K, B) registers).

Layout matches ops/field.py: (K, N) uint32 Montgomery limbs, batch minor.
Kernels are generated per FieldSpec and cached. Fall back to the jnp path on
CPU (tests run both and compare bit-for-bit).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = 0xFFFF  # python int: pallas kernels may not capture array constants

# default batch block (lanes x sublanes fill): 8 sublanes x 128 lanes x 4
_BLOCK = 4096


def _carry_rows(rows):
    """Exact carry propagation over a list of (B,) uint32 rows (in-kernel).

    Sequential ripple over the (static) row list: each step leaves row i
    < 2^16 and pushes its high part up. Unrolled K+ steps of cheap VPU ops.
    """
    out = list(rows)
    carry = None
    for i in range(len(out)):
        v = out[i] if carry is None else out[i] + carry
        out[i] = v & MASK16
        carry = v >> 16
    return out  # top carry dropped (callers ensure headroom)


def _sub_cond_rows(rows, m_limbs):
    """rows - m if rows >= m else rows (rows: list of (B,) u16-limbs)."""
    k = len(rows)
    borrow = jnp.zeros_like(rows[0])
    diff = []
    for i in range(k):
        mi = int(m_limbs[i]) if i < len(m_limbs) else 0
        d = rows[i] - mi - borrow
        borrow = (d >> 31) & 1  # u32 wraparound detection via sign bit
        diff.append(d & MASK16)
    keep = borrow > 0  # borrow out -> rows < m
    return [jnp.where(keep, r, d) for r, d in zip(rows, diff)]


def _mont_mul_rows(a_rows, b_rows, m_limbs, inv16):
    """Unrolled CIOS-ish Montgomery multiply on row lists; returns K rows."""
    k = len(a_rows)
    acc = [jnp.zeros_like(a_rows[0]) for _ in range(2 * k + 1)]
    for j in range(k):
        bj = b_rows[j]
        carry = jnp.zeros_like(bj)
        for i in range(k):
            p = a_rows[i] * bj
            v = acc[i + j] + (p & MASK16) + carry
            acc[i + j] = v & MASK16
            carry = (v >> 16) + (p >> 16)
        v = acc[j + k] + carry
        acc[j + k] = v & MASK16
        acc[j + k + 1] = acc[j + k + 1] + (v >> 16)
    # Montgomery reduction
    for i in range(k):
        mi = (acc[i] * inv16) & MASK16
        carry = jnp.zeros_like(mi)
        for j in range(k):
            p = mi * int(m_limbs[j])
            v = acc[i + j] + (p & MASK16) + carry
            acc[i + j] = v & MASK16
            carry = (v >> 16) + (p >> 16)
        v = acc[i + k] + carry
        acc[i + k] = v & MASK16
        acc[i + k + 1] = acc[i + k + 1] + (v >> 16)
    res = _carry_rows(acc[k : 2 * k + 1])
    res = _sub_cond_rows(res, m_limbs)
    return res[:k]


def _add_rows(a_rows, b_rows, m_limbs):
    k = len(a_rows)
    s = [a_rows[i] + b_rows[i] for i in range(k)] + [jnp.zeros_like(a_rows[0])]
    s = _carry_rows(s)
    s = _sub_cond_rows(s, np.concatenate([m_limbs, np.zeros(1, np.uint32)]))
    return s[:k]


def _sub_rows_v2(a_rows, b_rows, m_limbs):
    """a - b mod m via a + (2^16K + m - b) trick with plain carries."""
    k = len(a_rows)
    # t = a + m + (~b & mask) + 1 == a + m - b + 2^16K
    rows = []
    for i in range(k):
        comp = (MASK16 - b_rows[i]) & MASK16
        rows.append(a_rows[i] + int(m_limbs[i]) + comp)
    rows[0] = rows[0] + 1
    rows.append(jnp.zeros_like(a_rows[0]))
    rows = _carry_rows(rows)
    res = rows[:k]  # dropping row k removes the 2^16K bias
    res = _sub_cond_rows(res, m_limbs)
    return res


def _make_kernel(op: str, spec):
    m_limbs = spec.m_limbs
    inv16 = int(spec.inv16)
    k = spec.nlimb

    def kernel(a_ref, b_ref, o_ref):
        a_rows = [a_ref[i, :] for i in range(k)]
        b_rows = [b_ref[i, :] for i in range(k)]
        if op == "mul":
            out = _mont_mul_rows(a_rows, b_rows, m_limbs, inv16)
        elif op == "add":
            out = _add_rows(a_rows, b_rows, m_limbs)
        else:
            out = _sub_rows_v2(a_rows, b_rows, m_limbs)
        for i in range(k):
            o_ref[i, :] = out[i]

    return kernel


def _interpret() -> bool:
    import os

    return os.environ.get("SPARTAN_PALLAS_INTERPRET", "0") == "1" or (
        jax.default_backend() == "cpu"
    )


@functools.lru_cache(maxsize=None)
def _build_op(op: str, spec, n: int, block: int):
    k = spec.nlimb
    grid = (n // block,)
    kernel = _make_kernel(op, spec)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )


def _pad_to_block(a, block):
    k, n = a.shape
    rem = n % block
    if rem == 0:
        return a, n
    pad = block - rem
    return jnp.concatenate([a, jnp.zeros((k, pad), jnp.uint32)], axis=1), n


def _run(op: str, spec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    k, n = a.shape
    block = min(_BLOCK, max(128, ((n + 127) // 128) * 128))  # lane-aligned
    a_p, orig = _pad_to_block(a, block)
    b_p, _ = _pad_to_block(b, block)
    out = _build_op(op, spec, a_p.shape[1], block)(a_p, b_p)
    return out[:, :orig]


def mont_mul(spec, a, b):
    return _run("mul", spec, a, b)


def add(spec, a, b):
    return _run("add", spec, a, b)


def sub(spec, a, b):
    return _run("sub", spec, a, b)
