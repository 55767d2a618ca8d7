"""Batched short-Weierstrass Jacobian point arithmetic for G1/G2.

TPU-native equivalent of ``ark-ec``'s projective arithmetic
(reference use: ``into_affine``/``batch_normalization_into_affine``,
src/commitment/setup.rs:65-68; the group ops underlying every MSM call).
A batch of points is a `PointBatch(x, y, z, field)` in Jacobian coordinates
(affine = (X/Z^2, Y/Z^3)); the point at infinity is encoded as Z = 0, making
identity handling a lane-wise select rather than a branch.

Formulas (a = 0 curves, which both BLS12-381 G1 and G2 are):
- double: 2M + 5S        (standard dbl-2009-l)
- add:    11M + 5S + selects resolving P==Q (fall back to double), P or Q = inf

Everything is data-oblivious: fixed op sequence + jnp.where lane selects, so
the whole MSM pipeline jits into one static program (no data-dependent
control flow — the XLA requirement called out in the build brief).

The coordinate field is abstracted by a tiny adapter so the same code drives
G1 (Fp) and G2 (Fp2); see `G1_FIELD` / `G2_FIELD`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import numpy as np
import jax.numpy as jnp

from spartan_tpu.host import field as hf
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import fp2
from spartan_tpu.ops.field import FP


# ---------------------------------------------------------------------------
# Field adapters
# ---------------------------------------------------------------------------


class FieldAdapter:
    """Vectorized coordinate-field ops for curve formulas."""

    name: str

    def add(self, a, b):
        raise NotImplementedError

    def sub(self, a, b):
        raise NotImplementedError

    def mul(self, a, b):
        raise NotImplementedError

    def sq(self, a):
        return self.mul(a, a)

    def zeros(self, n):
        raise NotImplementedError

    def is_zero(self, a):
        raise NotImplementedError

    def select(self, mask, a, b):
        raise NotImplementedError

    def dbl(self, a):
        return self.add(a, a)


class _FpAdapter(FieldAdapter):
    name = "fp"

    def add(self, a, b):
        return fo.add(FP, a, b)

    def sub(self, a, b):
        return fo.sub(FP, a, b)

    def mul(self, a, b):
        return fo.mont_mul(FP, a, b)

    def zeros(self, n):
        return fo.zeros(FP, (n,))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def select(self, mask, a, b):
        return jnp.where(mask[None, :], a, b)


class _Fp2Adapter(FieldAdapter):
    name = "fp2"

    def add(self, a, b):
        return fp2.add2(a, b)

    def sub(self, a, b):
        return fp2.sub2(a, b)

    def mul(self, a, b):
        return fp2.mul2(a, b)

    def sq(self, a):
        return fp2.sq2(a)

    def zeros(self, n):
        return fp2.zeros2((n,))

    def is_zero(self, a):
        return jnp.all(a[0] == 0, axis=0) & jnp.all(a[1] == 0, axis=0)

    def select(self, mask, a, b):
        return fp2.select2(mask, a, b)


G1_FIELD = _FpAdapter()
G2_FIELD = _Fp2Adapter()


class PointBatch(NamedTuple):
    """Jacobian points; x/y/z are field elements batched over the last axis."""

    x: Any
    y: Any
    z: Any


# ---------------------------------------------------------------------------
# Group law
# ---------------------------------------------------------------------------


def infinity(f: FieldAdapter, n: int) -> PointBatch:
    # (1 : 1 : 0) — any X, Y with Z=0 works; keep zeros for determinism
    return PointBatch(f.zeros(n), f.zeros(n), f.zeros(n))


def is_infinity(f: FieldAdapter, p: PointBatch):
    return f.is_zero(p.z)


def _pallas_ok(p: PointBatch) -> bool:
    leaf = p.x if not isinstance(p.x, tuple) else p.x[0]
    return fo._use_pallas() and getattr(leaf, "ndim", 0) == 2


def double(f: FieldAdapter, p: PointBatch) -> PointBatch:
    """dbl-2009-l, a=0. Maps infinity to infinity (Z stays 0)."""
    if _pallas_ok(p):
        from spartan_tpu.ops import pallas_curve

        return (
            pallas_curve.g1_double(p) if f.name == "fp" else pallas_curve.g2_double(p)
        )
    a = f.sq(p.x)
    b = f.sq(p.y)
    c = f.sq(b)
    d = f.sub(f.sq(f.add(p.x, b)), f.add(a, c))
    d = f.dbl(d)
    e = f.add(f.dbl(a), a)  # 3A
    g = f.sq(e)
    x3 = f.sub(g, f.dbl(d))
    c8 = f.dbl(f.dbl(f.dbl(c)))
    y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
    z3 = f.dbl(f.mul(p.y, p.z))
    return PointBatch(x3, y3, z3)


def add(f: FieldAdapter, p: PointBatch, q: PointBatch) -> PointBatch:
    """Complete-by-selects Jacobian add: handles P=inf, Q=inf, P=Q, P=-Q."""
    if _pallas_ok(p) and _pallas_ok(q):
        from spartan_tpu.ops import pallas_curve

        return pallas_curve.g1_add(p, q) if f.name == "fp" else pallas_curve.g2_add(p, q)
    z1z1 = f.sq(p.z)
    z2z2 = f.sq(q.z)
    u1 = f.mul(p.x, z2z2)
    u2 = f.mul(q.x, z1z1)
    s1 = f.mul(f.mul(p.y, q.z), z2z2)
    s2 = f.mul(f.mul(q.y, p.z), z1z1)
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)

    h2 = f.sq(h)
    h3 = f.mul(h, h2)
    u1h2 = f.mul(u1, h2)
    r2 = f.sq(r)
    x3 = f.sub(f.sub(r2, h3), f.dbl(u1h2))
    y3 = f.sub(f.mul(r, f.sub(u1h2, x3)), f.mul(s1, h3))
    z3 = f.mul(f.mul(p.z, q.z), h)
    generic = PointBatch(x3, y3, z3)

    # edge lanes
    p_inf = is_infinity(f, p)
    q_inf = is_infinity(f, q)
    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    same_point = h_zero & r_zero & ~p_inf & ~q_inf
    opposite = h_zero & ~r_zero  # P = -Q -> infinity (z3 = 0 already since h=0... z3 = z1 z2 h = 0) ✓

    dbl_res = double(f, p)
    out_x = f.select(same_point, dbl_res.x, generic.x)
    out_y = f.select(same_point, dbl_res.y, generic.y)
    out_z = f.select(same_point, dbl_res.z, generic.z)
    out_x = f.select(p_inf, q.x, out_x)
    out_y = f.select(p_inf, q.y, out_y)
    out_z = f.select(p_inf, q.z, out_z)
    out_x = f.select(q_inf & ~p_inf, p.x, out_x)
    out_y = f.select(q_inf & ~p_inf, p.y, out_y)
    out_z = f.select(q_inf & ~p_inf, p.z, out_z)
    return PointBatch(out_x, out_y, out_z)


def add_mixed(f: FieldAdapter, p: PointBatch, q: PointBatch) -> PointBatch:
    """Jacobian + affine-encoded point (Z2 = 1, or Z2 = 0 for infinity).

    madd-2007-bl shape (a=0): 8M + 3S vs the full add's 12M + 4S — ~30%
    cheaper. Valid whenever q comes from g1_encode/g2_encode or a normalized
    key table (the MSM bucket walks and the fixed-base ladder always add
    ORIGINAL base points, which are affine). Same edge-lane handling as add.
    """
    if _pallas_ok(p) and _pallas_ok(q):
        from spartan_tpu.ops import pallas_curve

        return (
            pallas_curve.g1_madd(p, q) if f.name == "fp" else pallas_curve.g2_madd(p, q)
        )
    z1z1 = f.sq(p.z)
    u2 = f.mul(q.x, z1z1)
    s2 = f.mul(f.mul(q.y, p.z), z1z1)
    h = f.sub(u2, p.x)
    r = f.sub(s2, p.y)

    h2 = f.sq(h)
    h3 = f.mul(h, h2)
    u1h2 = f.mul(p.x, h2)
    r2 = f.sq(r)
    x3 = f.sub(f.sub(r2, h3), f.dbl(u1h2))
    y3 = f.sub(f.mul(r, f.sub(u1h2, x3)), f.mul(p.y, h3))
    z3 = f.mul(p.z, h)
    generic = PointBatch(x3, y3, z3)

    p_inf = is_infinity(f, p)
    q_inf = is_infinity(f, q)
    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    same_point = h_zero & r_zero & ~p_inf & ~q_inf

    dbl_res = double(f, p)
    out_x = f.select(same_point, dbl_res.x, generic.x)
    out_y = f.select(same_point, dbl_res.y, generic.y)
    out_z = f.select(same_point, dbl_res.z, generic.z)
    out_x = f.select(p_inf, q.x, out_x)
    out_y = f.select(p_inf, q.y, out_y)
    out_z = f.select(p_inf, q.z, out_z)
    out_x = f.select(q_inf & ~p_inf, p.x, out_x)
    out_y = f.select(q_inf & ~p_inf, p.y, out_y)
    out_z = f.select(q_inf & ~p_inf, p.z, out_z)
    return PointBatch(out_x, out_y, out_z)


def select_point(f: FieldAdapter, mask, p: PointBatch, q: PointBatch) -> PointBatch:
    return PointBatch(
        f.select(mask, p.x, q.x), f.select(mask, p.y, q.y), f.select(mask, p.z, q.z)
    )


def normalize(f: FieldAdapter, spec_inv, p: PointBatch):
    """Jacobian -> affine-with-z-flag: returns (x, y, inf_mask).

    spec_inv: batched field inverse function for the adapter's field.
    Infinity lanes return x = y = 0.
    """
    zinv = spec_inv(p.z)
    zinv2 = f.sq(zinv)
    zinv3 = f.mul(zinv2, zinv)
    return f.mul(p.x, zinv2), f.mul(p.y, zinv3), is_infinity(f, p)


# ---------------------------------------------------------------------------
# Host <-> device codecs
# ---------------------------------------------------------------------------


def g1_encode(points) -> PointBatch:
    """List of host affine G1 points (or None) -> Jacobian PointBatch (Montgomery)."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(0), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    return PointBatch(
        fo.encode_mont(FP, xs), fo.encode_mont(FP, ys), fo.encode_mont(FP, zs)
    )


def g1_decode(p: PointBatch):
    """Jacobian PointBatch -> list of host affine points (None = infinity).

    One host fetch for all three coordinate arrays (3 separate device_gets
    cost 2 extra tunnel round-trips per commit decode)."""
    n = p.x.shape[-1]
    stacked = np.asarray(jnp.concatenate([p.x, p.y, p.z], axis=-1))
    xs = fo.decode_mont(FP, stacked[:, :n])
    ys = fo.decode_mont(FP, stacked[:, n : 2 * n])
    zs = fo.decode_mont(FP, stacked[:, 2 * n :])
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(z, hf.P - 2, hf.P)
            out.append((x * zinv * zinv % hf.P, y * zinv * zinv * zinv % hf.P))
    return out


def g2_encode(points) -> PointBatch:
    x0, x1, y0, y1, zs = [], [], [], [], []
    for pt in points:
        if pt is None:
            x0.append(0), x1.append(0), y0.append(0), y1.append(0), zs.append(0)
        else:
            (a0, a1), (b0, b1) = pt
            x0.append(a0), x1.append(a1), y0.append(b0), y1.append(b1), zs.append(1)
    zero = [0] * len(points)
    return PointBatch(
        (fo.encode_mont(FP, x0), fo.encode_mont(FP, x1)),
        (fo.encode_mont(FP, y0), fo.encode_mont(FP, y1)),
        (fo.encode_mont(FP, zs), fo.encode_mont(FP, zero)),
    )


def g2_decode_many(points: list):
    """Decode a list of batch-1 G2 PointBatches with ONE host fetch.

    Each g2_decode costs ~6 host<->device roundtrips (one per coordinate
    array); through the axon tunnel that dominated opening-proof time. Stack
    all coords into one device array and fetch once.
    """
    cols = []
    for p in points:
        cols += [p.x[0], p.x[1], p.y[0], p.y[1], p.z[0], p.z[1]]
    stacked = np.asarray(jnp.concatenate(cols, axis=1))  # (24, 6*len)
    out = []
    for i in range(len(points)):
        vals = [
            fo.decode_mont(FP, stacked[:, 6 * i + j : 6 * i + j + 1])[0]
            for j in range(6)
        ]
        x0, x1, y0, y1, z0, z1 = vals
        if z0 == 0 and z1 == 0:
            out.append(None)
            continue
        zinv = hf.fp2_inv((z0, z1))
        zinv2 = hf.fp2_sq(zinv)
        zinv3 = hf.fp2_mul(zinv2, zinv)
        out.append(
            (hf.fp2_mul((x0, x1), zinv2), hf.fp2_mul((y0, y1), zinv3))
        )
    return out


def g2_decode(p: PointBatch):
    x0 = fo.decode_mont(FP, p.x[0])
    x1 = fo.decode_mont(FP, p.x[1])
    y0 = fo.decode_mont(FP, p.y[0])
    y1 = fo.decode_mont(FP, p.y[1])
    z0 = fo.decode_mont(FP, p.z[0])
    z1 = fo.decode_mont(FP, p.z[1])
    out = []
    for a0, a1, b0, b1, c0, c1 in zip(x0, x1, y0, y1, z0, z1):
        if c0 == 0 and c1 == 0:
            out.append(None)
        else:
            z = (c0, c1)
            zinv = hf.fp2_inv(z)
            zinv2 = hf.fp2_sq(zinv)
            zinv3 = hf.fp2_mul(zinv2, zinv)
            out.append((hf.fp2_mul((a0, a1), zinv2), hf.fp2_mul((b0, b1), zinv3)))
    return out
