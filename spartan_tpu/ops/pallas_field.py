"""Pallas TPU kernels for batched prime-field arithmetic.

The jnp limb implementation in ops/field.py lowers each Montgomery multiply
to ~50 HLO ops with fori_loops and dynamic-slice accumulator updates; on TPU
that structure round-trips the accumulator through memory every limb step and
measured ~9M Fr muls/s — far off the VPU integer roofline. These kernels run
the whole interleaved-CIOS Montgomery multiply + carry + conditional subtract
in one kernel over VMEM blocks.

Layout matches ops/field.py: (K, N) uint32 Montgomery limbs, batch minor.

Compile-cost design (the round-2/3 lesson): the first version unrolled the
K^2 schoolbook limb loop in-kernel — a G2 point-add kernel traced ~300k jaxpr
ops and cost minutes of Python tracing plus minutes of Mosaic compilation,
per kernel, per process (the TPU backend does not persistently cache Mosaic
kernels). The multiply now runs as a lax.fori_loop over the K limbs of b
whose body is traced ONCE: interleaved CIOS with a one-limb accumulator
DOWN-SHIFT per step (a static slice — no dynamic accumulator indexing, which
Mosaic lowers poorly). Kernel jaxprs are a few hundred ops; tracing is
milliseconds and Mosaic compiles in seconds.

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

MASK16 = 0xFFFF  # python int: scalar constants are always safe to capture

import os as _os

# default batch block (lanes x sublanes fill): 8 sublanes x 128 lanes x 4
_BLOCK = int(_os.environ.get("SPARTAN_PALLAS_BLOCK", "4096"))

# limbs of b consumed per fori_loop step in the CIOS multiply (must divide
# both 16 and 24; compile cost grows, runtime shrinks with larger values)
_UNROLL = int(_os.environ.get("SPARTAN_PALLAS_UNROLL", "4"))


def _shift_up(arr):
    """(K, B) -> (K, B): out[i] = arr[i-1], out[0] = 0 (static slices)."""
    return jnp.concatenate([jnp.zeros_like(arr[:1]), arr[:-1]], axis=0)


def _shift_up_by(x, d):
    return jnp.concatenate([jnp.zeros_like(x[:d]), x[:-d]], axis=0)


def _carry_exact(acc):
    """Exact carry propagation over a (K, B) lazy-limb array (in-kernel).

    Kogge-Stone (generate/propagate) prefix over full-width arrays —
    O(log K) wide vector ops instead of the former K-step single-row ripple
    (2K narrow (1, B) ops, terrible VPU sublane utilization; the ripple ran
    after EVERY field op inside the fused point kernels and dominated them).
    Handles input limbs < 2^32; leaves every limb < 2^16; top carry dropped
    (callers ensure headroom in the leading limb). Mirrors ops/limb.py's
    carry_exact (host-tested).
    """
    lo = acc & MASK16
    s = lo + _shift_up(acc >> 16)
    lo = s & MASK16  # < 2^16
    g = s >> 16  # generate, in {0,1}
    p = (lo == MASK16).astype(jnp.uint32)  # propagate
    k = acc.shape[0]
    d = 1
    while d < k:
        g = g | (p & _shift_up_by(g, d))
        p = p & _shift_up_by(p, d)
        d *= 2
    return (lo + _shift_up(g)) & MASK16


def _sub_cond(acc, m_limbs):
    """acc - m if acc >= m else acc; acc (K, B) exact 16-bit limbs.

    Two's-complement add + one KS carry pass (wide ops) instead of the
    former K-step borrow ripple.
    """
    k = acc.shape[0]
    comp_rows = jnp.concatenate(
        [
            jnp.full_like(acc[:1], MASK16 - (int(m_limbs[i]) if i < len(m_limbs) else 0))
            for i in range(k)
        ],
        axis=0,
    )
    s = acc + comp_rows
    s = s + jnp.concatenate(
        [jnp.full_like(acc[:1], 1), jnp.zeros_like(acc[1:])], axis=0
    )
    ext = jnp.concatenate([s, jnp.zeros_like(acc[:1])], axis=0)
    ext = _carry_exact(ext)
    no_borrow = ext[k] > 0  # carry out of the top limb -> acc >= m
    return jnp.where(no_borrow[None, :], ext[:k], acc)


def _mont_mul_arr(a, b, m_limbs, inv16):
    """Interleaved-CIOS Montgomery multiply on (K, B) uint32 limb arrays.

    Per b-limb step (fori_loop body, traced once):
      acc += a * b[j]; m = acc[0] * inv16 mod 2^16; acc += m * M;
      acc >>= one limb (static shift; the low limb is divisible by 2^16).
    Lazy carries: a masked split keeps limbs < 2^17 so no uint32 overflows.
    """
    k = a.shape[0]
    # scalar-constant rows (pallas kernels may not capture array constants)
    m_col = jnp.concatenate(
        [jnp.full_like(a[:1], int(m_limbs[i])) for i in range(k)], axis=0
    )  # (K, B)
    zpad = jnp.zeros((2,) + a.shape[1:], jnp.uint32)
    acc0 = jnp.concatenate([jnp.zeros_like(a), zpad], axis=0)  # (K+2, B)

    def one_limb(acc, bcur):
        bj = bcur[0:1]  # (1, B): current limb of b
        bcur = jnp.concatenate([bcur[1:], jnp.zeros_like(bcur[:1])], axis=0)
        p = a * bj  # (K, B) exact 32-bit products
        # mi from acc[0] + p[0] BEFORE accumulating: only the low 16 bits
        # matter, and u32 wraparound preserves them — this lets p and q merge
        # into one accumulate below.
        mi = ((acc[0] + p[0]) * inv16) & MASK16  # (B,)
        q = m_col * mi[None, :]  # (K, B)
        lo = (p & MASK16) + (q & MASK16)  # < 2^17
        hi = (p >> 16) + (q >> 16)  # < 2^17
        acc = (
            acc
            + jnp.concatenate([lo, zpad], axis=0)
            + jnp.concatenate([zpad[:1], hi, zpad[:1]], axis=0)
        )
        # limb 0 is now divisible by 2^16: shift the accumulator down one
        # limb, folding limb 0's high part into the new low limb
        carry0 = acc[0] >> 16
        acc = jnp.concatenate([acc[1:], zpad[:1]], axis=0)
        # scatter-free static-index add (Mosaic lacks scatter lowering)
        acc = acc + jnp.concatenate([carry0[None, :], jnp.zeros_like(acc[1:])], axis=0)
        # NO per-step carry split: each row gains < 2^18.3 per step (lo + hi
        # + carry0) and lives <= K+2 shifts, so rows stay < 2^23 — far from
        # u32 overflow. acc[0] is always an exact (unwrapped) sum, so carry0
        # and mi stay correct. The lazy split the earlier version ran every
        # step was ~30% of the kernel's vector ops.
        return acc, bcur

    # consume b's limbs in order without dynamic indexing (unsupported in
    # Mosaic): keep a rotating copy whose row 0 is the current limb. _UNROLL
    # limbs per fori step trade a slightly larger traced body for better
    # Mosaic scheduling (measured ~1.5x on the MSM-dominant mul).
    u = _UNROLL if k % _UNROLL == 0 else 1

    def step(j, carry):
        acc, bcur = carry
        for _ in range(u):
            acc, bcur = one_limb(acc, bcur)
        return acc, bcur

    acc, _ = jax.lax.fori_loop(0, k // u, step, (acc0, b))
    res = _carry_exact(acc)  # value < 2m, exact limbs
    res = _sub_cond(res, np.concatenate([m_limbs, np.zeros(2, np.uint32)]))
    return res[:k]


def _add_arr(a, b, m_limbs):
    s = jnp.concatenate([a + b, jnp.zeros_like(a[:1])], axis=0)
    s = _carry_exact(s)
    s = _sub_cond(s, np.concatenate([m_limbs, np.zeros(1, np.uint32)]))
    return s[: a.shape[0]]


def _sub_arr(a, b, m_limbs):
    """a - b mod m via a + (2^16K + m - b) trick with plain carries."""
    k = a.shape[0]
    m_col = jnp.concatenate(
        [jnp.full_like(a[:1], int(m_limbs[i])) for i in range(k)], axis=0
    )
    comp = (MASK16 - b) & MASK16
    rows = a + m_col + comp
    rows = rows + jnp.concatenate(
        [jnp.full_like(rows[:1], 1), jnp.zeros_like(rows[1:])], axis=0
    )
    rows = jnp.concatenate([rows, jnp.zeros_like(a[:1])], axis=0)
    rows = _carry_exact(rows)
    res = rows[:k]  # dropping row k removes the 2^16K bias
    return _sub_cond(res, m_limbs)


def _make_kernel(op: str, spec):
    m_limbs = spec.m_limbs
    inv16 = int(spec.inv16)

    def kernel(a_ref, b_ref, o_ref):
        a, b = a_ref[...], b_ref[...]
        if op == "mul":
            o_ref[...] = _mont_mul_arr(a, b, m_limbs, inv16)
        elif op == "add":
            o_ref[...] = _add_arr(a, b, m_limbs)
        else:
            o_ref[...] = _sub_arr(a, b, m_limbs)

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
