"""Host-side BLS12-381 optimal-ate pairing.

TPU-native equivalent of the reference's use of ``E::pairing`` /
``E::product_of_pairings`` (reference: src/commitment/verify.rs:15,41).
The pairing appears only in PC verification — 2*(nv+1) pairings per proof
(SURVEY.md §2.2: "not a hot loop") — so a host implementation is the right
architecture: keep the MXU/VPU for the MSM/sumcheck flops, do the tiny
pairing product on the host CPU.

Implementation: generic affine Miller loop over E(Fp12) after untwisting G2
(w^2 = v, v^3 = xi tower; untwist (x', y') -> (x'/w^2, y'/w^3)), followed by
final exponentiation with the easy part done via Frobenius/conjugation and the
hard part via the Hayashida-Hayasaka-Teruya x-chain (five 64-bit
exponentiations; see ``final_exponentiation``). Amortized via shared final
exponentiation in ``product_of_pairings``.
"""

from __future__ import annotations

from spartan_tpu.host import field as hf
from spartan_tpu.host.field import (
    FP12_ONE,
    fp12_conj,
    fp12_frob,
    fp12_inv,
    fp12_mul,
    fp12_pow,
    fp12_sq,
)

# -- Fp12 embedding helpers -------------------------------------------------


def _fp12_from_fp(a: int):
    return (((a % hf.P, 0), hf.FP2_ZERO, hf.FP2_ZERO), hf.FP6_ZERO)


def _fp12_from_fp2(a):
    return ((a, hf.FP2_ZERO, hf.FP2_ZERO), hf.FP6_ZERO)


_W = (hf.FP6_ZERO, hf.FP6_ONE)  # w
_W2 = fp12_sq(_W)
_W3 = fp12_mul(_W2, _W)
_W2_INV = fp12_inv(_W2)
_W3_INV = fp12_inv(_W3)


def _untwist(q):
    """Map a G2 point (Fp2 coords on the twist) to E(Fp12)."""
    if q is None:
        return None
    x, y = q
    return (
        fp12_mul(_fp12_from_fp2(x), _W2_INV),
        fp12_mul(_fp12_from_fp2(y), _W3_INV),
    )


def _fp12_sub(a, b):
    return (hf.fp6_sub(a[0], b[0]), hf.fp6_sub(a[1], b[1]))


def _fp12_eq(a, b) -> bool:
    return a == b


# -- Miller loop ------------------------------------------------------------


def _line_eval(a, b, px, py):
    """Evaluate the line through points a, b (on E(Fp12)) at P=(px,py) (Fp12).

    Returns (line_value, a+b). Handles a==b (tangent) and vertical lines.
    """
    xa, ya = a
    xb, yb = b
    if _fp12_eq(xa, xb) and not _fp12_eq(ya, yb):
        # vertical line: l(P) = x_P - x_a ; a + b = infinity
        return _fp12_sub(px, xa), None
    if _fp12_eq(xa, xb):
        # tangent: lambda = 3 x^2 / 2y
        num = fp12_mul(_fp12_from_fp(3), fp12_sq(xa))
        two_y = (hf.fp6_add(ya[0], ya[0]), hf.fp6_add(ya[1], ya[1]))
        lam = fp12_mul(num, fp12_inv(two_y))
    else:
        lam = fp12_mul(_fp12_sub(yb, ya), fp12_inv(_fp12_sub(xb, xa)))
    # l(P) = (y_P - y_a) - lambda (x_P - x_a)
    line = _fp12_sub(_fp12_sub(py, ya), fp12_mul(lam, _fp12_sub(px, xa)))
    # a + b
    x3 = _fp12_sub(_fp12_sub(fp12_sq(lam), xa), xb)
    y3 = _fp12_sub(fp12_mul(lam, _fp12_sub(xa, x3)), ya)
    return line, (x3, y3)


def miller_loop(p, q):
    """f_{|BLS_X|, Q}(P) with the x<0 conjugation folded in.

    p: G1 affine (int coords) or None; q: G2 affine (Fp2 coords) or None.
    """
    if p is None or q is None:
        return FP12_ONE
    px = _fp12_from_fp(p[0])
    py = _fp12_from_fp(p[1])
    qt = _untwist(q)

    t = qt
    f = FP12_ONE
    x_abs = hf.BLS_X_ABS
    bits = bin(x_abs)[3:]  # skip leading 1
    for bit in bits:
        line, t = _line_eval(t, t, px, py)
        f = fp12_mul(fp12_sq(f), line)
        if bit == "1":
            line, t = _line_eval(t, qt, px, py)
            f = fp12_mul(f, line)
    # BLS parameter is negative: f_{-|x|} corresponds to conjugation
    # (inversion up to final exponentiation).
    return fp12_conj(f)


# -- Final exponentiation ---------------------------------------------------

_HARD_EXP = (hf.P**4 - hf.P**2 + 1) // hf.R


def _easy_part(f):
    """f^((p^6 - 1)(p^2 + 1)) — lands in the cyclotomic subgroup."""
    f = fp12_mul(fp12_conj(f), fp12_inv(f))
    return fp12_mul(fp12_frob(f, 2), f)


def final_exponentiation_slow(f):
    """f^((p^12 - 1) / r): plain square-and-multiply hard part (~2800-bit
    exponent). Kept as the cross-check oracle for the fast path below."""
    return fp12_pow(_easy_part(f), _HARD_EXP)


def final_exponentiation(f):
    """f^(3 * (p^12 - 1) / r)  — the standard BLS12 "easier hard part".

    Uses the Hayashida–Hayasaka–Teruya decomposition
        3 * (p^4 - p^2 + 1)/r = (x-1)^2 * (x+p) * (x^2 + p^2 - 1) + 3
    so the hard part costs five ~64-bit exponentiations by |x| instead of one
    2800-bit one (~9x fewer Fp12 squarings). The result is the STANDARD
    pairing raised to the fixed power 3; since GT has prime order r != 3,
    cubing is injective, so every equality / bilinearity / product check is
    unaffected (this module never exports raw GT values elsewhere).
    Verified against ``final_exponentiation_slow`` in tests/test_host_field.py.
    """
    m = _easy_part(f)
    x1 = hf.BLS_X_ABS + 1  # |x - 1| (BLS parameter x is negative)
    # a = m^((x-1)^2): two exponentiations by the negative (x-1), each a
    # pow by |x-1| plus a conjugate (inverse == conjugate in the cyclotomic
    # subgroup); the two conjugates cancel but are kept for clarity
    a = fp12_conj(fp12_pow(m, x1))
    a = fp12_conj(fp12_pow(a, x1))
    # b = a^(x + p) = a^x * a^p
    b = fp12_mul(fp12_conj(fp12_pow(a, hf.BLS_X_ABS)), fp12_frob(a, 1))
    # c = b^(x^2 + p^2 - 1) = b^(x^2) * b^(p^2) * conj(b)
    bx2 = fp12_pow(fp12_pow(b, hf.BLS_X_ABS), hf.BLS_X_ABS)  # x^2 = |x|^2
    c = fp12_mul(fp12_mul(bx2, fp12_frob(b, 2)), fp12_conj(b))
    # * m^3
    return fp12_mul(c, fp12_mul(fp12_sq(m), m))


def pairing_py(p, q):
    """e(P, Q) for P in G1, Q in G2 (affine tuples, None = infinity)."""
    return final_exponentiation(miller_loop(p, q))


def product_of_pairings_py(pairs):
    """prod_i e(P_i, Q_i) with one shared final exponentiation.

    Mirrors ``E::product_of_pairings`` (reference: src/commitment/verify.rs:41).
    """
    f = FP12_ONE
    for p, q in pairs:
        f = fp12_mul(f, miller_loop(p, q))
    return final_exponentiation(f)


def pairing(p, q):
    """e(P, Q); native C++ tower when available (~20x), Python fallback.

    Both paths compute the identical value (tests/test_native.py
    cross-checks), so results from either are interchangeable.
    """
    return product_of_pairings([(p, q)])


def product_of_pairings(pairs):
    from spartan_tpu.host import native

    res = native.pairing_product_native(pairs)
    if res is not None:
        return res
    return product_of_pairings_py(pairs)
