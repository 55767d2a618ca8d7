"""Fused Pallas kernels for Jacobian point arithmetic (G1/G2).

One kernel per group op: the full add (with identity/doubling edge lanes)
runs over VMEM (K, B) limb arrays, so the ~36 field multiplies of a point-add
never round-trip HBM between ops. Compared to composing the per-field-op
kernels, this cuts HBM traffic per MSM scan step ~10x and removes
inter-kernel glue.

Builds on the array-based field primitives in pallas_field (loop-based
interleaved CIOS — see that module's compile-cost note; the earlier fully
unrolled row-list version traced ~300k jaxpr ops per point-add kernel and
cost minutes of tracing + Mosaic compilation each). Layout matches
ops/curve.py: G1 coords are (24, N) uint32 Fp Montgomery limb arrays; G2
coords are pairs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spartan_tpu.ops import pallas_field as pf
from spartan_tpu.ops.field import FP

MASK16 = 0xFFFF
import os as _os

# batch lanes per block (VMEM: ~36 live (24,B) temporaries). 256 measured
# ~12% faster than 512 and ~20% faster than 1024 on the open-shaped G2
# msm_many (v5e, round-5 sweep: scripts/sweep_kernel_knobs.py — smaller
# blocks keep the live temporaries resident in VMEM).
_BLOCK = int(_os.environ.get("SPARTAN_PALLAS_CURVE_BLOCK", "256"))


class _Fp:
    """(K, B)-array Fp ops bound to the BLS12-381 base field."""

    def __init__(self):
        self.m = FP.m_limbs
        self.inv16 = int(FP.inv16)
        self.k = FP.nlimb

    def mul(self, a, b):
        return pf._mont_mul_arr(a, b, self.m, self.inv16)

    def sq(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return pf._add_arr(a, b, self.m)

    def sub(self, a, b):
        return pf._sub_arr(a, b, self.m)

    def dbl(self, a):
        return self.add(a, a)

    def zero(self, like):
        return jnp.zeros_like(like)

    def is_zero(self, a):
        acc = a[0]
        for i in range(1, self.k):
            acc = acc | a[i]
        return acc == 0

    def select(self, mask, a, b):
        return jnp.where(mask[None, :], a, b)


class _Fp2:
    """Row-list Fp2 ops (pairs of row lists), Karatsuba."""

    def __init__(self):
        self.fp = _Fp()
        self.k = self.fp.k

    def mul(self, a, b):
        f = self.fp
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        return (f.sub(t0, t1), f.sub(f.sub(t2, t0), t1))

    def sq(self, a):
        f = self.fp
        t0 = f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        t1 = f.mul(a[0], a[1])
        return (t0, f.add(t1, t1))

    def add(self, a, b):
        f = self.fp
        return (f.add(a[0], b[0]), f.add(a[1], b[1]))

    def sub(self, a, b):
        f = self.fp
        return (f.sub(a[0], b[0]), f.sub(a[1], b[1]))

    def dbl(self, a):
        return self.add(a, a)

    def zero(self, like):
        return (self.fp.zero(like[0]), self.fp.zero(like[0]))  # like: pair

    def is_zero(self, a):
        return self.fp.is_zero(a[0]) & self.fp.is_zero(a[1])

    def select(self, mask, a, b):
        f = self.fp
        return (f.select(mask, a[0], b[0]), f.select(mask, a[1], b[1]))


def _double_rows(f, x, y, z):
    """dbl-2009-l (a=0) on row-list coords."""
    a = f.sq(x)
    b = f.sq(y)
    c = f.sq(b)
    d = f.sub(f.sq(f.add(x, b)), f.add(a, c))
    d = f.dbl(d)
    e = f.add(f.dbl(a), a)
    g = f.sq(e)
    x3 = f.sub(g, f.dbl(d))
    c8 = f.dbl(f.dbl(f.dbl(c)))
    y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
    z3 = f.dbl(f.mul(y, z))
    return x3, y3, z3


def _add_rows_pts(f, x1, y1, z1, x2, y2, z2):
    """Jacobian add with edge-lane selects (mirrors ops/curve.py add)."""
    z1z1 = f.sq(z1)
    z2z2 = f.sq(z2)
    u1 = f.mul(x1, z2z2)
    u2 = f.mul(x2, z1z1)
    s1 = f.mul(f.mul(y1, z2), z2z2)
    s2 = f.mul(f.mul(y2, z1), z1z1)
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)
    h2 = f.sq(h)
    h3 = f.mul(h, h2)
    u1h2 = f.mul(u1, h2)
    r2 = f.sq(r)
    x3 = f.sub(f.sub(r2, h3), f.dbl(u1h2))
    y3 = f.sub(f.mul(r, f.sub(u1h2, x3)), f.mul(s1, h3))
    z3 = f.mul(f.mul(z1, z2), h)

    p_inf = f.is_zero(z1)
    q_inf = f.is_zero(z2)
    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    same = h_zero & r_zero & ~p_inf & ~q_inf

    dx, dy, dz = _double_rows(f, x1, y1, z1)
    ox = f.select(same, dx, x3)
    oy = f.select(same, dy, y3)
    oz = f.select(same, dz, z3)
    ox = f.select(p_inf, x2, ox)
    oy = f.select(p_inf, y2, oy)
    oz = f.select(p_inf, z2, oz)
    q_only = q_inf & ~p_inf
    ox = f.select(q_only, x1, ox)
    oy = f.select(q_only, y1, oy)
    oz = f.select(q_only, z1, oz)
    return ox, oy, oz


def _madd_rows_pts(f, x1, y1, z1, x2, y2, z2):
    """Jacobian + affine-encoded (Z2 in {0,1}): madd-2007-bl shape, 8M+3S."""
    z1z1 = f.sq(z1)
    u2 = f.mul(x2, z1z1)
    s2 = f.mul(f.mul(y2, z1), z1z1)
    h = f.sub(u2, x1)
    r = f.sub(s2, y1)
    h2 = f.sq(h)
    h3 = f.mul(h, h2)
    u1h2 = f.mul(x1, h2)
    r2 = f.sq(r)
    x3 = f.sub(f.sub(r2, h3), f.dbl(u1h2))
    y3 = f.sub(f.mul(r, f.sub(u1h2, x3)), f.mul(y1, h3))
    z3 = f.mul(z1, h)

    p_inf = f.is_zero(z1)
    q_inf = f.is_zero(z2)
    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    same = h_zero & r_zero & ~p_inf & ~q_inf

    dx, dy, dz = _double_rows(f, x1, y1, z1)
    ox = f.select(same, dx, x3)
    oy = f.select(same, dy, y3)
    oz = f.select(same, dz, z3)
    ox = f.select(p_inf, x2, ox)
    oy = f.select(p_inf, y2, oy)
    oz = f.select(p_inf, z2, oz)
    q_only = q_inf & ~p_inf
    ox = f.select(q_only, x1, ox)
    oy = f.select(q_only, y1, oy)
    oz = f.select(q_only, z1, oz)
    return ox, oy, oz


def _rows(ref, k):
    del k
    return ref[...]


def _store(ref, arr):
    ref[...] = arr


def _g1_add_kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
    f = _Fp()
    k = f.k
    rx, ry, rz = _add_rows_pts(
        f, _rows(ax, k), _rows(ay, k), _rows(az, k),
        _rows(bx, k), _rows(by, k), _rows(bz, k),
    )
    _store(ox, rx)
    _store(oy, ry)
    _store(oz, rz)


def _g1_madd_kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
    f = _Fp()
    k = f.k
    rx, ry, rz = _madd_rows_pts(
        f, _rows(ax, k), _rows(ay, k), _rows(az, k),
        _rows(bx, k), _rows(by, k), _rows(bz, k),
    )
    _store(ox, rx)
    _store(oy, ry)
    _store(oz, rz)


def _g2_madd_kernel(ax0, ax1, ay0, ay1, az0, az1,
                    bx0, bx1, by0, by1, bz0, bz1,
                    ox0, ox1, oy0, oy1, oz0, oz1):
    f = _Fp2()
    k = f.k
    A = lambda c0, c1: (_rows(c0, k), _rows(c1, k))
    rx, ry, rz = _madd_rows_pts(
        f, A(ax0, ax1), A(ay0, ay1), A(az0, az1),
        A(bx0, bx1), A(by0, by1), A(bz0, bz1),
    )
    _store(ox0, rx[0]); _store(ox1, rx[1])
    _store(oy0, ry[0]); _store(oy1, ry[1])
    _store(oz0, rz[0]); _store(oz1, rz[1])


def _g1_double_kernel(ax, ay, az, ox, oy, oz):
    f = _Fp()
    k = f.k
    rx, ry, rz = _double_rows(f, _rows(ax, k), _rows(ay, k), _rows(az, k))
    _store(ox, rx)
    _store(oy, ry)
    _store(oz, rz)


def _g2_add_kernel(ax0, ax1, ay0, ay1, az0, az1,
                   bx0, bx1, by0, by1, bz0, bz1,
                   ox0, ox1, oy0, oy1, oz0, oz1):
    f = _Fp2()
    k = f.k
    A = lambda c0, c1: (_rows(c0, k), _rows(c1, k))
    rx, ry, rz = _add_rows_pts(
        f, A(ax0, ax1), A(ay0, ay1), A(az0, az1),
        A(bx0, bx1), A(by0, by1), A(bz0, bz1),
    )
    _store(ox0, rx[0]); _store(ox1, rx[1])
    _store(oy0, ry[0]); _store(oy1, ry[1])
    _store(oz0, rz[0]); _store(oz1, rz[1])


def _g2_double_kernel(ax0, ax1, ay0, ay1, az0, az1,
                      ox0, ox1, oy0, oy1, oz0, oz1):
    f = _Fp2()
    k = f.k
    A = lambda c0, c1: (_rows(c0, k), _rows(c1, k))
    rx, ry, rz = _double_rows(f, A(ax0, ax1), A(ay0, ay1), A(az0, az1))
    _store(ox0, rx[0]); _store(ox1, rx[1])
    _store(oy0, ry[0]); _store(oy1, ry[1])
    _store(oz0, rz[0]); _store(oz1, rz[1])


@functools.lru_cache(maxsize=None)
def _build(kind: str, n: int, block: int):
    k = FP.nlimb
    nin = {"g1_add": 6, "g1_madd": 6, "g1_double": 3,
           "g2_add": 12, "g2_madd": 12, "g2_double": 6}[kind]
    nout = {"g1_add": 3, "g1_madd": 3, "g1_double": 3,
            "g2_add": 6, "g2_madd": 6, "g2_double": 6}[kind]
    kernel = {
        "g1_add": _g1_add_kernel,
        "g1_madd": _g1_madd_kernel,
        "g1_double": _g1_double_kernel,
        "g2_add": _g2_add_kernel,
        "g2_madd": _g2_madd_kernel,
        "g2_double": _g2_double_kernel,
    }[kind]
    spec = pl.BlockSpec((k, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    # the default 16 MB scoped-vmem limit forces tiny 512-lane blocks (the
    # point formulas hold ~36 live (24, B) temporaries); raising it lets
    # wider blocks amortize per-op issue overhead (v5e has 128 MB VMEM)
    kw = {}
    if not pf._interpret():
        try:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        except AttributeError:  # older jax naming
            kw["compiler_params"] = pltpu.TPUCompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((k, n), jnp.uint32) for _ in range(nout)),
        grid=(n // block,),
        in_specs=[spec] * nin,
        out_specs=tuple(spec for _ in range(nout)),
        interpret=pf._interpret(),
        **kw,
    )


# A point-add kernel body takes ~10-30 s of pure Python to TRACE (tens of
# thousands of inner jnp-jit traces), and pallas re-traces it for every
# pallas_call instance — i.e. for every distinct lane width. One MSM touches
# a dozen widths (walk lanes, each reduce-tree halving, the Horner tail), so
# kernel TRACING dominated cold prove (~480 s of an 820 s cold 2^12 prove,
# profiled). Fix: run every op at one of TWO canonical widths — pad small
# ops to _BLOCK lanes, split big ones into _CHUNK-lane pieces — and wrap
# each (kind, width) in jax.jit. The nested jit is NOT inlined at trace
# time, so the kernel traces once per process and each later use costs one
# pjit equation; the padding/split waste is bounded (<= _BLOCK-1 lanes for
# small ops, < _CHUNK per big op) and the canonical shapes double as better
# persistent-cache keys shared across problem sizes.
_CHUNK = 4096


@functools.lru_cache(maxsize=None)
def _jitted(kind: str, width: int):
    return jax.jit(lambda *arrs: _build(kind, width, _BLOCK)(*arrs))


def _run(kind: str, arrs):
    arrs = list(arrs)
    k, n = arrs[0].shape
    if n <= _BLOCK:
        if n < _BLOCK:
            z = jnp.zeros((k, _BLOCK - n), jnp.uint32)
            arrs = [jnp.concatenate([a, z], axis=1) for a in arrs]
        outs = _jitted(kind, _BLOCK)(*arrs)
        return [o[:, :n] for o in outs]
    nc = (n + _CHUNK - 1) // _CHUNK
    if n < nc * _CHUNK:
        z = jnp.zeros((k, nc * _CHUNK - n), jnp.uint32)
        arrs = [jnp.concatenate([a, z], axis=1) for a in arrs]
    fn = _jitted(kind, _CHUNK)
    pieces = []
    for c in range(nc):
        sl = [a[:, c * _CHUNK : (c + 1) * _CHUNK] for a in arrs]
        pieces.append(fn(*sl))
    outs = [
        jnp.concatenate([p[i] for p in pieces], axis=1)
        for i in range(len(pieces[0]))
    ]
    return [o[:, :n] for o in outs]


# -- public: PointBatch-level ops ------------------------------------------


def g1_add(p, q):
    from spartan_tpu.ops.curve import PointBatch

    ox, oy, oz = _run("g1_add", [p.x, p.y, p.z, q.x, q.y, q.z])
    return PointBatch(ox, oy, oz)


def g1_madd(p, q):
    from spartan_tpu.ops.curve import PointBatch

    ox, oy, oz = _run("g1_madd", [p.x, p.y, p.z, q.x, q.y, q.z])
    return PointBatch(ox, oy, oz)


def g1_double(p):
    from spartan_tpu.ops.curve import PointBatch

    ox, oy, oz = _run("g1_double", [p.x, p.y, p.z])
    return PointBatch(ox, oy, oz)


def g2_add(p, q):
    from spartan_tpu.ops.curve import PointBatch

    o = _run(
        "g2_add",
        [p.x[0], p.x[1], p.y[0], p.y[1], p.z[0], p.z[1],
         q.x[0], q.x[1], q.y[0], q.y[1], q.z[0], q.z[1]],
    )
    return PointBatch((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))


def g2_madd(p, q):
    from spartan_tpu.ops.curve import PointBatch

    o = _run(
        "g2_madd",
        [p.x[0], p.x[1], p.y[0], p.y[1], p.z[0], p.z[1],
         q.x[0], q.x[1], q.y[0], q.y[1], q.z[0], q.z[1]],
    )
    return PointBatch((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))


def g2_double(p):
    from spartan_tpu.ops.curve import PointBatch

    o = _run("g2_double", [p.x[0], p.x[1], p.y[0], p.y[1], p.z[0], p.z[1]])
    return PointBatch((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))
