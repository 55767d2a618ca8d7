"""Host-side (Python-int) BLS12-381 G1/G2 group arithmetic.

Scalar oracle for the batched TPU curve kernels (naive-vs-fast testing, the
reference's own test pattern: src/commitment/commit.rs:48-66 `naive_commit`
vs MSM). Also used for one-time host jobs (generator prep, tiny MSMs).

Points are affine tuples ``(x, y)`` with ``None`` as the point at infinity.
Generic over the coordinate field via small op tables, so the same code serves
G1 (Fp) and G2 (Fp2).
"""

from __future__ import annotations

from spartan_tpu.host import field as hf


class CurveOps:
    """Affine short-Weierstrass arithmetic y^2 = x^3 + b over a field."""

    def __init__(self, add, sub, mul, sq, neg, inv, zero, one, b):
        self.fadd, self.fsub, self.fmul, self.fsq = add, sub, mul, sq
        self.fneg, self.finv, self.zero, self.one, self.b = neg, inv, zero, one, b

    # -- point ops ---------------------------------------------------------
    def is_on_curve(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        return self.fsq(y) == self.fadd(self.fmul(self.fsq(x), x), self.b)

    def neg(self, pt):
        if pt is None:
            return None
        return (pt[0], self.fneg(pt[1]))

    def double(self, pt):
        if pt is None:
            return None
        x, y = pt
        if y == self.zero_val():
            return None
        # lambda = 3x^2 / 2y
        lam = self.fmul(
            self.fmul(self.fsq(x), self._three),
            self.finv(self.fadd(y, y)),
        )
        x3 = self.fsub(self.fsq(lam), self.fadd(x, x))
        y3 = self.fsub(self.fmul(lam, self.fsub(x, x3)), y)
        return (x3, y3)

    def add(self, p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        if x1 == x2:
            if y1 == y2:
                return self.double(p1)
            return None
        lam = self.fmul(self.fsub(y2, y1), self.finv(self.fsub(x2, x1)))
        x3 = self.fsub(self.fsq(lam), self.fadd(x1, x2))
        y3 = self.fsub(self.fmul(lam, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def mul(self, pt, k: int):
        k = k % hf.R
        result = None
        addend = pt
        while k:
            if k & 1:
                result = self.add(result, addend)
            addend = self.double(addend)
            k >>= 1
        return result

    def msm(self, points, scalars):
        """Naive multi-scalar multiplication (oracle for the TPU Pippenger)."""
        acc = None
        for pt, s in zip(points, scalars):
            acc = self.add(acc, self.mul(pt, s))
        return acc

    def zero_val(self):
        return self.zero

    @property
    def _three(self):
        if self.one == 1:
            return 3
        # field "one" scaled by 3 for tuple fields
        return self.fadd(self.fadd(self.one, self.one), self.one)


def _fp_ops():
    P = hf.P
    return CurveOps(
        add=lambda a, b: (a + b) % P,
        sub=lambda a, b: (a - b) % P,
        mul=lambda a, b: (a * b) % P,
        sq=lambda a: (a * a) % P,
        neg=lambda a: (-a) % P,
        inv=hf.fp_inv,
        zero=0,
        one=1,
        b=hf.B_G1,
    )


def _fp2_ops():
    return CurveOps(
        add=hf.fp2_add,
        sub=hf.fp2_sub,
        mul=hf.fp2_mul,
        sq=hf.fp2_sq,
        neg=hf.fp2_neg,
        inv=hf.fp2_inv,
        zero=hf.FP2_ZERO,
        one=hf.FP2_ONE,
        b=hf.B_G2,
    )


G1 = _fp_ops()
G2 = _fp2_ops()


def g1_lincomb(points, scalars):
    """sum_i s_i * P_i over G1 — native C++ Jacobian path when available.

    The PC verifier's host-side group work (reference src/commitment/
    verify.rs:14,21-24: com * g^{-eval} and g^{t_i - point_i}) is exactly
    this shape; the native path turns ~16ms/scalar-mul Python bigint work
    into ~0.3ms. Falls back to the affine Python oracle bit-identically.
    """
    from spartan_tpu.host import native

    res = native.g1_lincomb_native(points, scalars)
    if res is native.INF_POINT:
        return None
    if res is not None:
        return res
    acc = None
    for pt, s in zip(points, scalars):
        acc = G1.add(acc, G1.mul(pt, s))
    return acc
