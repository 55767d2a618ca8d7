"""Batched prime-field arithmetic on TPU: Montgomery form over 16-bit limbs.

TPU-native equivalent of ``ark-ff``'s Fp/Fr types (reference use sites:
src/commitment/commit.rs:21 ``into_repr``, src/commitment/setup.rs:35
``size_in_bits``; SURVEY.md §2.2 row "Prime field Fr"). One `FieldSpec` per
modulus: Fr (BLS12-381 scalar, 16 limbs) and Fp (base field, 24 limbs).

Elements live in Montgomery form (value * 2^(16K) mod m) as (K, ...) uint32
arrays — see `spartan_tpu.ops.limb` for the layout rationale. All public ops
keep elements canonical (< m) with exact 16-bit limbs.

The multiply is a schoolbook product followed by 16-bit CIOS-style Montgomery
reduction; both phases accumulate into a redundant (lazy-carry) accumulator
that is re-split every step so no uint32 ever overflows. Cost: 2*K^2 uint32
multiplies per field multiply (512 for Fr), all full-width vector ops over the
batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.ops import limb as lb
from spartan_tpu.ops.limb import MASK16, U32

__all__ = [
    "FieldSpec",
    "FR",
    "FP",
    "add",
    "sub",
    "neg",
    "mont_mul",
    "mont_sq",
    "to_mont",
    "from_mont",
    "inv",
    "zeros",
    "ones_mont",
    "encode_ints",
    "decode_ints",
    "encode_mont",
    "decode_mont",
    "reduce_wide",
]


@dataclass(frozen=True)
class FieldSpec:
    """Compile-time constants for one prime field."""

    modulus: int
    nlimb: int  # number of 16-bit limbs (modulus < 2^(16*nlimb))
    name: str = "F"
    # derived (host numpy) constants
    m_limbs: np.ndarray = dc_field(init=False, repr=False, compare=False)
    inv16: int = dc_field(init=False, repr=False, compare=False)
    r_mod: int = dc_field(init=False, repr=False, compare=False)  # 2^(16K) mod m
    r2_limbs: np.ndarray = dc_field(init=False, repr=False, compare=False)
    one_mont_limbs: np.ndarray = dc_field(init=False, repr=False, compare=False)
    # fold table: 2^(16*(K+j)) mod m for j in 0..K  (for wide reduction)
    fold: np.ndarray = dc_field(init=False, repr=False, compare=False)

    def __post_init__(self):
        k, m = self.nlimb, self.modulus
        object.__setattr__(self, "m_limbs", lb.int_to_limbs(m, k))
        object.__setattr__(self, "inv16", (-pow(m, -1, 1 << 16)) % (1 << 16))
        r = pow(2, 16 * k, m)
        object.__setattr__(self, "r_mod", r)
        object.__setattr__(self, "r2_limbs", lb.int_to_limbs(r * r % m, k))
        object.__setattr__(self, "one_mont_limbs", lb.int_to_limbs(r, k))
        fold = np.stack(
            [lb.int_to_limbs(pow(2, 16 * (k + j), m), k) for j in range(k + 2)]
        )
        object.__setattr__(self, "fold", fold)

    # -- host codecs -------------------------------------------------------
    def enc(self, xs):
        """ints -> canonical-form (K, N) device array (NOT Montgomery)."""
        return jnp.asarray(lb.ints_to_limbs_batch([x % self.modulus for x in xs], self.nlimb))

    def dec(self, arr):
        """(K, N) limb array (canonical) -> list of ints."""
        return lb.limbs_batch_to_ints(np.asarray(arr))


# BLS12-381 scalar field (Fr) and base field (Fp)
FR = FieldSpec(
    modulus=0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    nlimb=16,
    name="Fr",
)
FP = FieldSpec(
    modulus=0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    nlimb=24,
    name="Fp",
)


def zeros(spec: FieldSpec, batch_shape=()):
    return jnp.zeros((spec.nlimb,) + tuple(batch_shape), dtype=U32)


def ones_mont(spec: FieldSpec, batch_shape=()):
    col = jnp.asarray(spec.one_mont_limbs).reshape(
        (spec.nlimb,) + (1,) * len(batch_shape)
    )
    return jnp.broadcast_to(col, (spec.nlimb,) + tuple(batch_shape)).astype(U32)


# ---------------------------------------------------------------------------
# Add / sub / neg (canonical in, canonical out)
# ---------------------------------------------------------------------------


_USE_PALLAS = None


def _via_pallas(op, spec, a, b):
    """Flatten extra batch dims to the 2-D (K, N) kernel layout (elementwise
    ops are lane-order independent), run the Pallas kernel, restore shape."""
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape
    out = op(spec, a.reshape(spec.nlimb, -1), b.reshape(spec.nlimb, -1))
    return out.reshape(shape)


def _use_pallas() -> bool:
    """Route hot ops through the fused Pallas kernels on TPU.

    SPARTAN_PALLAS=0/1 forces off/on (1 uses interpret mode on CPU, for
    cross-checking the kernels in tests); default: on for TPU backends.
    """
    global _USE_PALLAS
    if _USE_PALLAS is None:
        import os

        env = os.environ.get("SPARTAN_PALLAS", "auto")
        if env == "0":
            _USE_PALLAS = False
        elif env == "1":
            _USE_PALLAS = True
        else:
            _USE_PALLAS = jax.default_backend() != "cpu"
    return _USE_PALLAS


@partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    if _use_pallas() and a.ndim >= 2 and b.ndim >= 2:
        from spartan_tpu.ops import pallas_field

        return _via_pallas(pallas_field.add, spec, a, b)
    k = spec.nlimb
    s = a + b  # limbs < 2^17
    ext = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], U32)], axis=0)
    ext = lb.carry_exact(ext)  # value < 2m fits in K+1 limbs
    # conditional subtract m over K+1 limbs
    m_ext = np.concatenate([spec.m_limbs, np.zeros(1, np.uint32)])
    ext = lb.sub_cond(ext, m_ext)
    return ext[:k]


@partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    if _use_pallas() and a.ndim >= 2 and b.ndim >= 2:
        from spartan_tpu.ops import pallas_field

        return _via_pallas(pallas_field.sub, spec, a, b)
    k = spec.nlimb
    m_col = jnp.asarray(spec.m_limbs).reshape((k,) + (1,) * (a.ndim - 1))
    s = a + m_col  # < 2^17, value = a + m
    # subtract b via complement: s + (2^16-1 - b) + 1 == a + m - b + 2^(16K)
    comp = (MASK16 - b).astype(U32)
    t = s + comp
    t = t.at[0].add(1)
    ext = jnp.concatenate([t, jnp.zeros((1,) + t.shape[1:], U32)], axis=0)
    ext = lb.carry_exact(ext)
    res = ext[:k]  # drop the 2^(16K) bias limb: value = a + m - b < 2m
    res = lb.sub_cond(res, spec.m_limbs)
    return res


def neg(spec: FieldSpec, a):
    return sub(spec, zeros(spec, a.shape[1:]), a)


# ---------------------------------------------------------------------------
# Montgomery multiply
# ---------------------------------------------------------------------------


def _acc_split(acc):
    """One lazy-carry split: keeps accumulator limbs < 2^17."""
    return (acc & MASK16) + lb._shift_up(acc >> 16)


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """(a * b * 2^-(16K)) mod m, canonical in/out. Broadcasts over batch dims.

    Interleaved 16-bit CIOS as ONE lax.fori_loop whose body is static-slice
    only (the same formulation as the Pallas kernel, pallas_field.py): per
    b-limb step, accumulate a*b_j and the Montgomery correction, then shift
    the accumulator down one limb — a concat, not a dynamic update. The MSM/
    curve layers compose thousands of these call sites, so per-site HLO size
    sets whole-program compile time; the earlier dynamic-slice two-phase loop
    tripled it."""
    if _use_pallas() and a.ndim >= 2 and b.ndim >= 2:
        from spartan_tpu.ops import pallas_field

        return _via_pallas(pallas_field.mont_mul, spec, a, b)
    k = spec.nlimb
    a, b = jnp.broadcast_arrays(a, b)
    bshape = a.shape[1:]
    m_col = jnp.asarray(spec.m_limbs).reshape((k,) + (1,) * len(bshape))
    inv16 = U32(spec.inv16)
    # derive zeros from `a` so loop carries inherit shard_map varying axes
    # (a plain jnp.zeros carry breaks lax loops under shard_map)
    zrow = a[:1] * 0  # (1, ...)
    zpad = jnp.concatenate([zrow, zrow], axis=0)  # (2, ...)
    acc0 = jnp.concatenate([jnp.zeros_like(a), zpad], axis=0)  # (K+2, ...)

    def step(j, carry):
        acc, bcur = carry
        bj = bcur[0:1]  # current limb of b (rotating copy, row 0)
        # zero row derived from b itself: under shard_map, a and b may have
        # different varying axes and the carry type must be stable
        bcur = jnp.concatenate([bcur[1:], bcur[:1] * 0], axis=0)
        p = a * bj  # (K, ...) exact 32-bit products
        # mi from acc[0] + p[0] BEFORE accumulating (wraparound preserves the
        # low 16 bits), merging the p and q accumulates into one pass
        mi = ((acc[0] + p[0]) * inv16) & MASK16
        q = m_col * mi[None, ...]
        lo = (p & MASK16) + (q & MASK16)  # < 2^17
        hi = (p >> 16) + (q >> 16)  # < 2^17
        acc = (
            acc
            + jnp.concatenate([lo, zpad], axis=0)
            + jnp.concatenate([zrow, hi, zrow], axis=0)
        )
        # limb 0 now divisible by 2^16: shift down one limb, folding its
        # high part into the new low limb
        carry0 = acc[0] >> 16
        acc = jnp.concatenate([acc[1:], zrow], axis=0)
        acc = acc + jnp.concatenate([carry0[None, ...], jnp.zeros_like(acc[1:])], axis=0)
        # no per-step carry split: rows gain < 2^18.3/step and live <= K+2
        # shifts, staying < 2^23 (see pallas_field._mont_mul_arr)
        return acc, bcur

    acc, _ = jax.lax.fori_loop(0, k, step, (acc0, b))

    res = lb.carry_exact(acc)  # (K+2, ...), value < 2m
    m_ext = np.concatenate([spec.m_limbs, np.zeros(2, np.uint32)])
    res = lb.sub_cond(res, m_ext)
    return res[:k]


def mont_sq(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    r2 = jnp.asarray(spec.r2_limbs).reshape((spec.nlimb,) + (1,) * (a.ndim - 1))
    return mont_mul(spec, a, r2)


def from_mont(spec: FieldSpec, a):
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(spec, a, one)


def pow_const(spec: FieldSpec, a, e: int):
    """Batched a^e (fixed public exponent), Montgomery form, via lax.scan.

    One square + one (masked) multiply per bit — traced once, scanned over
    the bit string, so trace/compile cost is O(1) in the exponent length.
    """
    bits = [int(c) for c in bin(e)[2:]]
    bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))

    def body(result, bit):
        result = mont_sq(spec, result)
        mul = mont_mul(spec, result, a)
        result = jnp.where(bit > 0, mul, result)
        return result, None

    # + a*0: inherit shard_map varying axes from the input
    init = ones_mont(spec, a.shape[1:]) + a * 0
    out, _ = jax.lax.scan(body, init, bits_arr)
    return out


def inv(spec: FieldSpec, a):
    """Batched inverse via Fermat: a^(m-2), in Montgomery form.

    Used for Jacobian->affine normalization; not a hot path. inv(0) = 0.
    """
    return pow_const(spec, a, spec.modulus - 2)


# ---------------------------------------------------------------------------
# Wide reduction (for segment sums of Montgomery values)
# ---------------------------------------------------------------------------


_MSHIFT_CACHE: dict = {}


def _m_shift_table(spec: FieldSpec, width: int, jmax: int) -> np.ndarray:
    key = (spec.name, width, jmax)
    tab = _MSHIFT_CACHE.get(key)
    if tab is None:
        tab = np.stack(
            [lb.int_to_limbs(spec.modulus << j, width) for j in range(jmax + 1)]
        )
        _MSHIFT_CACHE[key] = tab
    return tab


def _fold_pass(spec: FieldSpec, ext):
    """Fold all limbs above K back into K+2 limbs: limb(K+t) -> * (2^(16(K+t)) mod m)."""
    k = spec.nlimb
    top = ext[k:]
    base = ext[:k]
    acc = jnp.concatenate([base, jnp.zeros((2,) + base.shape[1:], U32)], axis=0)
    for t in range(top.shape[0]):
        f = jnp.asarray(spec.fold[t]).reshape((k,) + (1,) * (base.ndim - 1))
        p = f * top[t][None, ...]
        acc = acc.at[:k].add(p & MASK16)
        acc = acc.at[1 : k + 1].add(p >> 16)
        acc = _acc_split(acc)
    return lb.carry_exact(acc)  # (K+2, ...), exact 16-bit limbs


@partial(jax.jit, static_argnums=0)
def reduce_wide(spec: FieldSpec, acc):
    """Reduce a redundant accumulator (J >= K limbs, any uint32 values) mod m.

    Input value = sum limb_j * 2^(16 j); output canonical (K, ...) limbs.
    Stays in whatever (Montgomery) domain the inputs were in. Used after
    limb-wise segment sums (sparse mat-vec, MLE folds) where many field
    elements are added without intermediate modular reduction.

    Bound analysis: two fold passes bring the value under ~2^18 * m; a fixed
    ladder of conditional subtracts of m<<j (j = 19..0) then lands in [0, m).
    """
    k = spec.nlimb
    # exact-carry into J+2 limbs
    ext = jnp.concatenate([acc, jnp.zeros((2,) + acc.shape[1:], U32)], axis=0)
    ext = lb.carry_exact(ext)
    ext = _fold_pass(spec, ext)  # K+2 limbs
    ext = _fold_pass(spec, ext)  # value < 2^(16K) + 2*2^16*m < 2^18 * m
    mshift = _m_shift_table(spec, k + 2, 19)
    for j in range(19, -1, -1):
        ext = lb.sub_cond(ext, mshift[j])
    return ext[:k]


# ---------------------------------------------------------------------------
# Host codecs (Montgomery domain)
# ---------------------------------------------------------------------------


def encode_ints(spec: FieldSpec, xs):
    """ints -> canonical (non-Montgomery) device limbs (K, N)."""
    return spec.enc(xs)


def decode_ints(spec: FieldSpec, arr):
    return spec.dec(arr)


def encode_mont(spec: FieldSpec, xs):
    """ints -> Montgomery-form device limbs (K, N). Host-side multiply."""
    m, r = spec.modulus, spec.r_mod
    return spec.enc([x % m * r % m for x in xs])


def decode_mont(spec: FieldSpec, arr):
    """Montgomery-form limbs -> ints (host-side divide by R)."""
    m, r = spec.modulus, spec.r_mod
    rinv = pow(r, -1, m)
    return [x * rinv % m for x in spec.dec(arr)]
