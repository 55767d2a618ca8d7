"""Host-side (Python-int) BLS12-381 field arithmetic.

This is the scalar *oracle* layer: exact, slow-but-honest implementations used
as (a) the test reference for the batched TPU limb kernels (the reference
repo's naive-vs-fast test pattern, SURVEY.md §4), and (b) the cold path for
host-only protocol steps (Fiat–Shamir sampling, univariate interpolation,
pairings in verification — reference: src/commitment/verify.rs:12-45, never a
hot loop).

Field tower (standard BLS12-381 construction):
  Fp    — prime field, p = 381-bit BLS12-381 base field modulus
  Fp2   = Fp[u] / (u^2 + 1)
  Fp6   = Fp2[v] / (v^3 - xi), xi = u + 1
  Fp12  = Fp6[w] / (w^2 - v)
  Fr    — 255-bit scalar field (the field all R1CS/sumcheck arithmetic lives in;
          reference instantiates it as Bls12_381::Fr, src/test_utils.rs:15)

Representation: Fp elements are Python ints; Fp2 as 2-tuples, Fp6 as 3-tuples
of Fp2, Fp12 as 2-tuples of Fp6. All functions are pure.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Moduli and curve constants
# ---------------------------------------------------------------------------

# BLS12-381 base field modulus (381 bits)
P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
# BLS12-381 scalar field modulus (255 bits) — "Fr"
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# BLS parameter x (negative): p(x), r(x) are the BLS12 polynomials at this x.
BLS_X = -0xD201000000010000
BLS_X_ABS = 0xD201000000010000

# Curve equation constants: G1: y^2 = x^3 + 4; G2 (twist): y^2 = x^3 + 4(u+1)
B_G1 = 4
B_G2 = (4, 4)  # 4 * (u + 1) in Fp2

# Generators (standard, from the BLS12-381 spec)
G1_GEN = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)
G2_GEN = (
    (
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    ),
    (
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    ),
)

# ---------------------------------------------------------------------------
# Fr / Fp scalar helpers (ints mod m)
# ---------------------------------------------------------------------------


def fr_add(a: int, b: int) -> int:
    return (a + b) % R


def fr_sub(a: int, b: int) -> int:
    return (a - b) % R


def fr_mul(a: int, b: int) -> int:
    return (a * b) % R


def fr_neg(a: int) -> int:
    return (-a) % R


def fr_inv(a: int) -> int:
    if a % R == 0:
        raise ZeroDivisionError("inverse of zero in Fr")
    return pow(a, -1, R)  # extended gcd: ~50x faster than Fermat in CPython


def fr_pow(a: int, e: int) -> int:
    return pow(a, e, R)


def fp_inv(a: int) -> int:
    if a % P == 0:
        raise ZeroDivisionError("inverse of zero in Fp")
    return pow(a, -1, P)  # extended gcd: ~50x faster than Fermat in CPython


# ---------------------------------------------------------------------------
# Fp2 arithmetic: elements (c0, c1) = c0 + c1*u with u^2 = -1
# ---------------------------------------------------------------------------

FP2_ZERO = (0, 0)
FP2_ONE = (1, 0)


def fp2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fp2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fp2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def fp2_mul(a, b):
    # Karatsuba: (a0 + a1 u)(b0 + b1 u) = (a0b0 - a1b1) + ((a0+a1)(b0+b1) - a0b0 - a1b1) u
    t0 = a[0] * b[0]
    t1 = a[1] * b[1]
    t2 = (a[0] + a[1]) * (b[0] + b[1])
    return ((t0 - t1) % P, (t2 - t0 - t1) % P)


def fp2_sq(a):
    # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
    t0 = (a[0] + a[1]) * (a[0] - a[1])
    t1 = 2 * a[0] * a[1]
    return (t0 % P, t1 % P)


def fp2_scalar(a, k: int):
    return (a[0] * k % P, a[1] * k % P)


def fp2_conj(a):
    return (a[0], (-a[1]) % P)


def fp2_inv(a):
    # 1 / (a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
    norm = (a[0] * a[0] + a[1] * a[1]) % P
    n_inv = fp_inv(norm)
    return (a[0] * n_inv % P, (-a[1]) * n_inv % P)


def fp2_mul_by_xi(a):
    # multiply by xi = 1 + u: (a0 - a1) + (a0 + a1) u
    return ((a[0] - a[1]) % P, (a[0] + a[1]) % P)


# ---------------------------------------------------------------------------
# Fp6 arithmetic: (c0, c1, c2) = c0 + c1 v + c2 v^2, v^3 = xi
# ---------------------------------------------------------------------------

FP6_ZERO = (FP2_ZERO, FP2_ZERO, FP2_ZERO)
FP6_ONE = (FP2_ONE, FP2_ZERO, FP2_ZERO)


def fp6_add(a, b):
    return (fp2_add(a[0], b[0]), fp2_add(a[1], b[1]), fp2_add(a[2], b[2]))


def fp6_sub(a, b):
    return (fp2_sub(a[0], b[0]), fp2_sub(a[1], b[1]), fp2_sub(a[2], b[2]))


def fp6_neg(a):
    return (fp2_neg(a[0]), fp2_neg(a[1]), fp2_neg(a[2]))


def fp6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fp2_mul(a0, b0)
    t1 = fp2_mul(a1, b1)
    t2 = fp2_mul(a2, b2)
    c0 = fp2_add(t0, fp2_mul_by_xi(fp2_sub(fp2_mul(fp2_add(a1, a2), fp2_add(b1, b2)), fp2_add(t1, t2))))
    c1 = fp2_add(
        fp2_sub(fp2_mul(fp2_add(a0, a1), fp2_add(b0, b1)), fp2_add(t0, t1)),
        fp2_mul_by_xi(t2),
    )
    c2 = fp2_add(fp2_sub(fp2_mul(fp2_add(a0, a2), fp2_add(b0, b2)), fp2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fp6_sq(a):
    return fp6_mul(a, a)


def fp6_mul_by_v(a):
    # (c0 + c1 v + c2 v^2) * v = xi*c2 + c0 v + c1 v^2
    return (fp2_mul_by_xi(a[2]), a[0], a[1])


def fp6_inv(a):
    a0, a1, a2 = a
    c0 = fp2_sub(fp2_sq(a0), fp2_mul_by_xi(fp2_mul(a1, a2)))
    c1 = fp2_sub(fp2_mul_by_xi(fp2_sq(a2)), fp2_mul(a0, a1))
    c2 = fp2_sub(fp2_sq(a1), fp2_mul(a0, a2))
    t = fp2_add(
        fp2_mul_by_xi(fp2_add(fp2_mul(a2, c1), fp2_mul(a1, c2))),
        fp2_mul(a0, c0),
    )
    t_inv = fp2_inv(t)
    return (fp2_mul(c0, t_inv), fp2_mul(c1, t_inv), fp2_mul(c2, t_inv))


# ---------------------------------------------------------------------------
# Fp12 arithmetic: (c0, c1) = c0 + c1 w, w^2 = v
# ---------------------------------------------------------------------------

FP12_ZERO = (FP6_ZERO, FP6_ZERO)
FP12_ONE = (FP6_ONE, FP6_ZERO)


def fp12_add(a, b):
    return (fp6_add(a[0], b[0]), fp6_add(a[1], b[1]))


def fp12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = fp6_mul(a0, b0)
    t1 = fp6_mul(a1, b1)
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(b0, b1)), fp6_add(t0, t1))
    return (c0, c1)


def fp12_sq(a):
    a0, a1 = a
    # (a0 + a1 w)^2 = (a0^2 + v a1^2) + 2 a0 a1 w
    t0 = fp6_mul(a0, a1)
    c0 = fp6_add(
        fp6_mul(fp6_add(a0, a1), fp6_add(a0, fp6_mul_by_v(a1))),
        fp6_neg(fp6_add(t0, fp6_mul_by_v(t0))),
    )
    c1 = fp6_add(t0, t0)
    return (c0, c1)


def fp12_conj(a):
    return (a[0], fp6_neg(a[1]))


def fp12_inv(a):
    a0, a1 = a
    t = fp6_sub(fp6_sq(a0), fp6_mul_by_v(fp6_sq(a1)))
    t_inv = fp6_inv(t)
    return (fp6_mul(a0, t_inv), fp6_neg(fp6_mul(a1, t_inv)))


def fp12_pow(a, e: int):
    if e < 0:
        return fp12_pow(fp12_inv(a), -e)
    result = FP12_ONE
    base = a
    while e:
        if e & 1:
            result = fp12_mul(result, base)
        base = fp12_sq(base)
        e >>= 1
    return result


# Frobenius: x -> x^p. Precomputed constants for the tower.
# FROB_C1[i] = xi^((p^i - 1)/3) in Fp2 (for Fp6 c1), FROB_C2[i] = xi^((2p^i-2)/3)
# For Fp12: w -> w^p = gamma * w with gamma = xi^((p-1)/6).


def _xi_pow(e_num: int, e_den: int, i: int):
    """xi^((p^i - 1)*e_num/e_den) computed directly (slow, done once at import)."""
    e = (pow(P, i) - 1) * e_num // e_den
    # compute xi^e in Fp2 by square and multiply
    result = FP2_ONE
    base = (1, 1)  # xi = 1 + u
    while e:
        if e & 1:
            result = fp2_mul(result, base)
        base = fp2_sq(base)
        e >>= 1
    return result


_FROB_GAMMA_12 = [_xi_pow(1, 6, i) for i in range(12)]  # xi^((p^i-1)/6)
_FROB_C1_6 = [_xi_pow(1, 3, i) for i in range(6)]  # xi^((p^i-1)/3)
_FROB_C2_6 = [_xi_pow(2, 3, i) for i in range(6)]  # xi^(2(p^i-1)/3)


def _fp2_frob(a, i: int):
    # (a0 + a1 u)^(p^i): u^p = -u (since p ≡ 3 mod 4), so conjugate when i odd
    return a if i % 2 == 0 else fp2_conj(a)


def _fp6_frob(a, i: int):
    c0 = _fp2_frob(a[0], i)
    c1 = fp2_mul(_fp2_frob(a[1], i), _FROB_C1_6[i % 6])
    c2 = fp2_mul(_fp2_frob(a[2], i), _FROB_C2_6[i % 6])
    return (c0, c1, c2)


def fp12_frob(a, i: int = 1):
    """Frobenius map x -> x^(p^i) on Fp12."""
    i = i % 12
    c0 = _fp6_frob(a[0], i)
    c1 = _fp6_frob(a[1], i)
    gamma = _FROB_GAMMA_12[i]
    c1 = tuple(fp2_mul(x, gamma) for x in c1)
    return (c0, c1)
