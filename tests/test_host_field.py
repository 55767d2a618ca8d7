"""Tests for the host scalar oracle: field tower, curves, pairing."""

import random

from spartan_tpu.host import field as hf
from spartan_tpu.host import curve as hc
from spartan_tpu.host import pairing as hp


def test_fp2_axioms():
    rng = random.Random(0)
    for _ in range(20):
        a = (rng.randrange(hf.P), rng.randrange(hf.P))
        b = (rng.randrange(hf.P), rng.randrange(hf.P))
        assert hf.fp2_mul(a, b) == hf.fp2_mul(b, a)
        assert hf.fp2_sq(a) == hf.fp2_mul(a, a)
        if a != (0, 0):
            assert hf.fp2_mul(a, hf.fp2_inv(a)) == hf.FP2_ONE


def test_fp6_fp12_inverse():
    rng = random.Random(1)
    for _ in range(5):
        a6 = tuple((rng.randrange(hf.P), rng.randrange(hf.P)) for _ in range(3))
        assert hf.fp6_mul(a6, hf.fp6_inv(a6)) == hf.FP6_ONE
        a12 = (
            tuple((rng.randrange(hf.P), rng.randrange(hf.P)) for _ in range(3)),
            tuple((rng.randrange(hf.P), rng.randrange(hf.P)) for _ in range(3)),
        )
        assert hf.fp12_mul(a12, hf.fp12_inv(a12)) == hf.FP12_ONE


def test_fp12_frobenius_is_p_power():
    rng = random.Random(2)
    a12 = (
        tuple((rng.randrange(hf.P), rng.randrange(hf.P)) for _ in range(3)),
        tuple((rng.randrange(hf.P), rng.randrange(hf.P)) for _ in range(3)),
    )
    assert hf.fp12_frob(a12, 1) == hf.fp12_pow(a12, hf.P)
    assert hf.fp12_frob(a12, 2) == hf.fp12_frob(hf.fp12_frob(a12, 1), 1)


def test_generators_on_curve():
    assert hc.G1.is_on_curve(hf.G1_GEN)
    assert hc.G2.is_on_curve(hf.G2_GEN)


def test_curve_group_law():
    g = hf.G1_GEN
    ops = hc.G1
    assert ops.add(g, None) == g
    assert ops.add(g, ops.neg(g)) is None
    two_g = ops.double(g)
    assert ops.add(g, g) == two_g
    assert ops.add(two_g, g) == ops.mul(g, 3)
    # scalar field order annihilates the group
    assert ops.mul(g, hf.R) is None
    g2 = hf.G2_GEN
    assert hc.G2.mul(g2, hf.R) is None


def test_msm_oracle_matches_mul():
    ops = hc.G1
    g = hf.G1_GEN
    pts = [ops.mul(g, k) for k in (1, 2, 3)]
    scalars = [5, 7, 11]
    expect = ops.mul(g, 5 * 1 + 7 * 2 + 11 * 3)
    assert ops.msm(pts, scalars) == expect


def test_pairing_bilinearity():
    g1, g2 = hf.G1_GEN, hf.G2_GEN
    e = hp.pairing(g1, g2)
    assert e != hf.FP12_ONE  # non-degenerate
    a, b = 5, 7
    e_ab = hp.pairing(hc.G1.mul(g1, a), hc.G2.mul(g2, b))
    assert e_ab == hf.fp12_pow(e, a * b)
    # e(P+P', Q) == e(P,Q) e(P',Q)
    p2 = hc.G1.mul(g1, 3)
    lhs = hp.pairing(hc.G1.add(g1, p2), g2)
    rhs = hf.fp12_mul(hp.pairing(g1, g2), hp.pairing(p2, g2))
    assert lhs == rhs


def test_product_of_pairings():
    g1, g2 = hf.G1_GEN, hf.G2_GEN
    pairs = [(g1, g2), (hc.G1.mul(g1, 2), hc.G2.mul(g2, 3))]
    prod = hp.product_of_pairings(pairs)
    expect = hf.fp12_mul(hp.pairing(*pairs[0]), hp.pairing(*pairs[1]))
    assert prod == expect
    # equivalently e(g1,g2)^(1 + 6)
    assert prod == hf.fp12_pow(hp.pairing(g1, g2), 7)


def test_final_exponentiation_fast_equals_slow_cubed():
    """Fast hard part == slow hard part cubed (fast computes f^(3d))."""
    g1, g2 = hf.G1_GEN, hf.G2_GEN
    f = hp.miller_loop(hc.G1.mul(g1, 9), hc.G2.mul(g2, 4))
    fast = hp.final_exponentiation(f)
    slow = hp.final_exponentiation_slow(f)
    assert fast == hf.fp12_pow(slow, 3)
