"""Multi-limb big-integer machinery for TPU (JAX/XLA).

TPU-native replacement for the reference's arkworks ``ark-ff`` scalar
arithmetic (SURVEY.md §2.2: "Multi-limb Montgomery arithmetic as vectorized
kernels"). The reference does one field op at a time on a CPU core; here a
field element is a column of 16-bit limbs and *batches* of field elements are
2-D arrays with the limb axis leading:

    shape (K, ...batch...), dtype uint32, limb 0 = least significant 16 bits.

Rationale for the layout: the TPU VPU is (8, 128)-shaped over the trailing
axes, so the big batch axis must be trailing/minor — putting limbs first makes
every limb-wise op a full-width vector op over the batch.

Rationale for 16-bit limbs in uint32: TPU has no 64-bit multiplier; a 16x16
product fits exactly in uint32, so schoolbook/Montgomery accumulation never
needs a high-half multiply. Carries are propagated exactly with a Kogge-Stone
(generate/propagate) prefix pass — O(log K) vector steps, no ripple loop.

All functions are pure jnp and shape-polymorphic over the batch dims; wrap in
jit at the call site.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

MASK16 = jnp.uint32(0xFFFF)
U32 = jnp.uint32


def int_to_limbs(x: int, nlimb: int) -> np.ndarray:
    """Host: encode a non-negative int as an (nlimb,) uint32 array (16-bit limbs)."""
    if x < 0:
        raise ValueError("negative")
    out = np.zeros(nlimb, dtype=np.uint32)
    for i in range(nlimb):
        out[i] = x & 0xFFFF
        x >>= 16
    if x:
        raise ValueError("value does not fit in limbs")
    return out


def limbs_to_int(limbs) -> int:
    """Host: decode an (nlimb,) limb vector (any integer dtype) to an int."""
    arr = np.asarray(limbs, dtype=np.uint64)
    return sum(int(v) << (16 * i) for i, v in enumerate(arr))


def ints_to_limbs_batch(xs, nlimb: int) -> np.ndarray:
    """Host: encode a list of ints to a (nlimb, N) uint32 array.

    Bytes-based bulk path: int.to_bytes + one frombuffer instead of a
    per-element per-limb Python loop (the loop cost ~200 ms per 2^14-element
    table encode — it sat on the prover's critical path every proof).
    to_bytes raises OverflowError for values that don't fit, preserving the
    old fit check.
    """
    nb = 2 * nlimb
    buf = b"".join(x.to_bytes(nb, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), nlimb)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def limbs_batch_to_ints(limbs) -> list:
    """Host: decode a (nlimb, N) array to a list of ints (bytes-based bulk)."""
    arr = np.asarray(limbs)
    nlimb, n = arr.shape
    if arr.size and int(arr.max()) > 0xFFFF:  # lazy limbs: exact slow path
        return [limbs_to_int(arr[:, j]) for j in range(n)]
    nb = 2 * nlimb
    buf = np.ascontiguousarray(arr.T.astype(np.uint16)).tobytes()
    return [
        int.from_bytes(buf[j * nb : (j + 1) * nb], "little") for j in range(n)
    ]


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------


def _shift_up(x):
    """Shift limbs one position toward more-significant (axis 0), zero-fill."""
    pad = jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-1]], axis=0)


def carry_exact(x):
    """Exact carry propagation: (K, ...) uint32 (any values) -> limbs < 2^16.

    The total value must fit in K limbs; any carry out of the top limb is
    dropped (callers allocate headroom).

    Two split passes reduce all carries to {0,1}; a Kogge-Stone prefix over
    (generate, propagate) then resolves unit-carry chains in O(log K) steps.
    """
    # pass 1: limbs < 2^32 -> sums < 2^17 - 1
    lo = x & MASK16
    s = lo + _shift_up(x >> 16)
    # pass 2: carries now in {0,1}
    lo = s & MASK16  # < 2^16
    g = (s >> 16).astype(jnp.uint32)  # generate: carry out of limb i, in {0,1}
    p = (lo == MASK16).astype(jnp.uint32)  # propagate
    # Kogge-Stone: carry_in[i+1] = g[i] | (p[i] & carry_in[i])
    # Compute prefix over (g, p) pairs along axis 0.
    k = x.shape[0]
    dist = 1
    while dist < k:
        g_sh = jnp.concatenate(
            [jnp.zeros((dist,) + g.shape[1:], dtype=g.dtype), g[:-dist]], axis=0
        )
        p_sh = jnp.concatenate(
            [jnp.zeros((dist,) + p.shape[1:], dtype=p.dtype), p[:-dist]], axis=0
        )
        g = g | (p & g_sh)
        p = p & p_sh
        dist *= 2
    carry_in = _shift_up(g)
    return (lo + carry_in) & MASK16


def add_raw(a, b):
    """Limb-wise add (no carry handling). Caller tracks headroom."""
    return a + b


def sub_cond(x, m_limbs):
    """Conditionally subtract a constant: return x - m if x >= m else x.

    x: (K, ...) with limbs < 2^16 (exact). m_limbs: (K,) numpy uint32.
    """
    k = x.shape[0]
    m_col = m_limbs.reshape((k,) + (1,) * (x.ndim - 1))
    # two's-complement subtract: x + (~m) + 1, carried over K+1 limbs;
    # top carry == 1 iff x >= m.
    comp = (MASK16 - m_col).astype(U32)
    s = x + comp
    s = s.at[0].add(1)
    ext = jnp.concatenate([s, jnp.zeros((1,) + x.shape[1:], U32)], axis=0)
    ext = carry_exact(ext)
    no_borrow = ext[k] > 0  # (...,) bool
    return jnp.where(no_borrow[None, ...], ext[:k], x)


def geq_const(x, m_limbs) -> jnp.ndarray:
    """Return bool (...,) of x >= m (x exact limbs)."""
    k = x.shape[0]
    m_col = m_limbs.reshape((k,) + (1,) * (x.ndim - 1))
    comp = (MASK16 - m_col).astype(U32)
    s = x + comp
    s = s.at[0].add(1)
    ext = jnp.concatenate([s, jnp.zeros((1,) + x.shape[1:], U32)], axis=0)
    ext = carry_exact(ext)
    return ext[k] > 0
