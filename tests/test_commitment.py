"""Polynomial commitment: keygen/commit/open/verify (reference test patterns).

Mirrors the reference's commitment tests: naive-vs-fast keygen
(setup.rs:146-156), trapdoor-based naive commit (commit.rs:53-66), and the
full sanity round-trip with pairing check (verify.rs:60-95).
"""

import random

import pytest

from spartan_tpu.host import field as hf
from spartan_tpu.host import curve as hc
from spartan_tpu.ops import curve as cv
from spartan_tpu.ops import field as fo
from spartan_tpu.ops.field import FR
from spartan_tpu import commitment as pc


class _TestRng:
    def __init__(self, seed=0):
        self._r = random.Random(seed)

    def sample_fr(self):
        return self._r.randrange(hf.R)


NV = 3


@pytest.fixture(scope="module")
def setup():
    pp, vp, t = pc.keygen(NV, _TestRng(42))
    return pp, vp, t


def _mle_eval(tab, pt):
    t = list(tab)
    for r in pt:
        t = [(t[2 * b] + r * (t[2 * b + 1] - t[2 * b])) % hf.R for b in range(len(t) // 2)]
    return t[0]


def test_keygen_vs_naive(setup):
    pp, vp, t = setup
    # powers_of_g[i][b] must equal g^{eq(t[i..], b)} (reference dummy_keygen)
    for i in range(NV):
        pts = cv.g1_decode(pp.powers_of_g[i])
        for b in range(1 << (NV - i)):
            eq_val = 1
            for j, tj in enumerate(t[i:]):
                bit = (b >> j) & 1
                eq_val = eq_val * ((tj * bit + (1 - tj) * (1 - bit)) % hf.R) % hf.R
            assert pts[b] == hc.G1.mul(pp.g, eq_val)
    # vp masks
    for i in range(NV):
        assert vp.g_mask_random[i] == hc.G1.mul(pp.g, t[i])


def test_commit_vs_trapdoor(setup):
    pp, vp, t = setup
    rng = random.Random(7)
    poly_ints = [rng.randrange(hf.R) for _ in range(1 << NV)]
    poly = fo.encode_mont(FR, poly_ints)
    com = pc.commit(pp, poly)
    # naive: com == g^{poly(t)} using the returned trapdoor (commit.rs:48-52)
    expect = hc.G1.mul(pp.g, _mle_eval(poly_ints, t))
    assert com.g_product == expect


def test_open_verify_roundtrip(setup):
    pp, vp, t = setup
    rng = random.Random(8)
    poly_ints = [rng.randrange(hf.R) for _ in range(1 << NV)]
    poly = fo.encode_mont(FR, poly_ints)
    point = [rng.randrange(hf.R) for _ in range(NV)]

    com = pc.commit(pp, poly)
    ev, proof, q = pc.open_poly(pp, poly, point)
    assert ev == _mle_eval(poly_ints, point)
    # quotient identity: f(t) - f(point) = sum (t_i - point_i) q_i(t[i+1:]) ... via pairing
    assert pc.verify(vp, com, point, ev, proof)


def test_verify_rejects_wrong_eval(setup):
    pp, vp, t = setup
    rng = random.Random(9)
    poly_ints = [rng.randrange(hf.R) for _ in range(1 << NV)]
    poly = fo.encode_mont(FR, poly_ints)
    point = [rng.randrange(hf.R) for _ in range(NV)]
    com = pc.commit(pp, poly)
    ev, proof, _ = pc.open_poly(pp, poly, point)
    assert not pc.verify(vp, com, point, (ev + 1) % hf.R, proof)
