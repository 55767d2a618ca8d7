"""Batched Fp2 arithmetic (pairs of Fp limb arrays), for G2 kernels.

TPU-native equivalent of arkworks' quadratic-extension tower used by
``E::G2Projective`` (reference: the G2 MSMs of the commitment opening,
src/commitment/open.rs:46-49, and keygen src/commitment/setup.rs:61-69).

An Fp2 batch is a tuple (c0, c1) of (24, N) uint32 Montgomery Fp arrays;
u^2 = -1. Multiplication is Karatsuba (3 Fp muls).
"""

from __future__ import annotations

from spartan_tpu.ops import field as fo
from spartan_tpu.ops.field import FP

__all__ = [
    "add2", "sub2", "neg2", "mul2", "sq2", "zeros2", "scalar2", "select2",
]


def add2(a, b):
    return (fo.add(FP, a[0], b[0]), fo.add(FP, a[1], b[1]))


def sub2(a, b):
    return (fo.sub(FP, a[0], b[0]), fo.sub(FP, a[1], b[1]))


def neg2(a):
    return (fo.neg(FP, a[0]), fo.neg(FP, a[1]))


def mul2(a, b):
    t0 = fo.mont_mul(FP, a[0], b[0])
    t1 = fo.mont_mul(FP, a[1], b[1])
    t2 = fo.mont_mul(FP, fo.add(FP, a[0], a[1]), fo.add(FP, b[0], b[1]))
    c0 = fo.sub(FP, t0, t1)
    c1 = fo.sub(FP, fo.sub(FP, t2, t0), t1)
    return (c0, c1)


def sq2(a):
    # (a0+a1)(a0-a1) + 2 a0 a1 u
    t0 = fo.mont_mul(FP, fo.add(FP, a[0], a[1]), fo.sub(FP, a[0], a[1]))
    t1 = fo.mont_mul(FP, a[0], a[1])
    return (t0, fo.add(FP, t1, t1))


def zeros2(batch_shape=()):
    return (fo.zeros(FP, batch_shape), fo.zeros(FP, batch_shape))


def scalar2(a, k_limbs):
    """Multiply both coords by an Fp scalar (24,) or (24,1)."""
    kk = k_limbs.reshape(FP.nlimb, 1)
    return (fo.mont_mul(FP, a[0], kk), fo.mont_mul(FP, a[1], kk))


def select2(mask, a, b):
    """Elementwise select over the batch: mask (N,) bool."""
    import jax.numpy as jnp

    m = mask[None, :]
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))


def inv2(a):
    """Batched Fp2 inverse: conj(a) / (a0^2 + a1^2). inv2(0) = 0."""
    norm = fo.add(FP, fo.mont_mul(FP, a[0], a[0]), fo.mont_mul(FP, a[1], a[1]))
    n_inv = fo.inv(FP, norm)
    return (fo.mont_mul(FP, a[0], n_inv), fo.mont_mul(FP, fo.neg(FP, a[1]), n_inv))
