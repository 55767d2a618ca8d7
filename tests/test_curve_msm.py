"""Batched curve/MSM kernels vs the host scalar oracle (naive-vs-fast)."""

import random

import numpy as np
import jax.numpy as jnp

from spartan_tpu.host import field as hf
from spartan_tpu.host import curve as hc
from spartan_tpu.ops import curve as cv
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import msm as msm_mod
from spartan_tpu.ops.field import FR


def _rand_g1(rng, n):
    return [hc.G1.mul(hf.G1_GEN, rng.randrange(1, hf.R)) for _ in range(n)]


def _rand_g2(rng, n):
    return [hc.G2.mul(hf.G2_GEN, rng.randrange(1, hf.R)) for _ in range(n)]


def test_g1_add_double_roundtrip():
    rng = random.Random(0)
    pts = _rand_g1(rng, 4)
    batch = cv.g1_encode(pts)
    doubled = cv.double(cv.G1_FIELD, batch)
    assert cv.g1_decode(doubled) == [hc.G1.double(p) for p in pts]

    pts2 = _rand_g1(rng, 4)
    batch2 = cv.g1_encode(pts2)
    added = cv.add(cv.G1_FIELD, batch, batch2)
    assert cv.g1_decode(added) == [hc.G1.add(p, q) for p, q in zip(pts, pts2)]


def test_g1_add_edge_cases():
    rng = random.Random(1)
    p = _rand_g1(rng, 1)[0]
    cases_a = [p, None, p, p]
    cases_b = [p, p, None, hc.G1.neg(p)]  # double, inf+p, p+inf, p + (-p)
    a = cv.g1_encode(cases_a)
    b = cv.g1_encode(cases_b)
    got = cv.g1_decode(cv.add(cv.G1_FIELD, a, b))
    expect = [hc.G1.add(x, y) for x, y in zip(cases_a, cases_b)]
    assert got == expect


def test_g2_add_double():
    rng = random.Random(2)
    pts = _rand_g2(rng, 3)
    pts2 = _rand_g2(rng, 3)
    a, b = cv.g2_encode(pts), cv.g2_encode(pts2)
    got = cv.g2_decode(cv.add(cv.G2_FIELD, a, b))
    assert got == [hc.G2.add(p, q) for p, q in zip(pts, pts2)]
    got_d = cv.g2_decode(cv.double(cv.G2_FIELD, a))
    assert got_d == [hc.G2.double(p) for p in pts]


def test_msm_g1_matches_oracle():
    rng = random.Random(3)
    n = 33  # deliberately not a power of two
    pts = _rand_g1(rng, n)
    scalars = [rng.randrange(hf.R) for _ in range(n)]
    scalars[0] = 0  # digit-0 / zero-scalar path
    batch = cv.g1_encode(pts)
    slimbs = fo.encode_ints(FR, scalars)
    got = cv.g1_decode(msm_mod.msm(batch, slimbs, "fp", 8))[0]
    assert got == hc.G1.msm(pts, scalars)


def test_msm_g2_matches_oracle():
    rng = random.Random(4)
    n = 9
    pts = _rand_g2(rng, n)
    scalars = [rng.randrange(hf.R) for _ in range(n)]
    batch = cv.g2_encode(pts)
    slimbs = fo.encode_ints(FR, scalars)
    got = cv.g2_decode(msm_mod.msm(batch, slimbs, "fp2", 8))[0]
    assert got == hc.G2.msm(pts, scalars)


def test_msm_equal_digits_and_duplicates():
    rng = random.Random(5)
    g = hf.G1_GEN
    pts = [g, g, g, hc.G1.double(g)]
    scalars = [7, 7, 5, 1 << 200]
    batch = cv.g1_encode(pts)
    slimbs = fo.encode_ints(FR, scalars)
    got = cv.g1_decode(msm_mod.msm(batch, slimbs, "fp", 8))[0]
    assert got == hc.G1.msm(pts, scalars)


def test_msm_pippenger_small_matches_oracle():
    """The sort+walk Pippenger path, pinned at a size the msm() dispatcher
    would otherwise route to the small-n ladder (both paths must stay
    covered — msm() picks by SPARTAN_MSM_LADDER_MAX)."""
    rng = random.Random(21)
    n = 33
    pts = _rand_g1(rng, n)
    scalars = [rng.randrange(hf.R) for _ in range(n)]
    scalars[0] = 0
    batch = cv.g1_encode(pts)
    slimbs = fo.encode_ints(FR, scalars)
    got = cv.g1_decode(msm_mod.msm_pippenger(batch, slimbs, "fp", 8))[0]
    assert got == hc.G1.msm(pts, scalars)


def test_msm_many_pippenger_small_matches_oracle():
    rng = random.Random(22)
    sizes = (8, 4, 2, 1)
    pts = _rand_g1(rng, sum(sizes))
    scalars = [rng.randrange(hf.R) for _ in range(sum(sizes))]
    batch = cv.g1_encode(pts)
    slimbs = fo.encode_ints(FR, scalars)
    res = msm_mod.msm_many_pippenger(batch, sizes, slimbs, "fp", 4)
    got = cv.g1_decode(res)
    off = 0
    for j, sz in enumerate(sizes):
        assert got[j] == hc.G1.msm(pts[off : off + sz], scalars[off : off + sz])
        off += sz


def test_fixed_base_msm():
    rng = random.Random(6)
    table_host = msm_mod.fixed_base_table_host(hf.G1_GEN, hc.G1, c=8, nbits=256)
    table = cv.g1_encode(table_host)
    scalars = [rng.randrange(hf.R) for _ in range(5)] + [0, 1]
    slimbs = fo.encode_ints(FR, scalars)
    got = cv.g1_decode(msm_mod.fixed_base_msm(table, slimbs, "fp", 8))
    expect = [hc.G1.mul(hf.G1_GEN, s) for s in scalars]
    assert got == expect


def test_fixed_base_table_device_matches_host():
    """Device bit-ladder window table vs the host point loop (naive-vs-fast,
    the reference's own test pattern for its FixedBaseMSM window table —
    src/commitment/setup.rs:61-69)."""
    want = msm_mod.fixed_base_table_host(hf.G1_GEN, hc.G1, c=4, nbits=16)
    got_batch = msm_mod.fixed_base_table_device(
        hf.G1_GEN, hc.G1, cv.g1_encode, "fp", c=4, nbits=16
    )
    got = cv.g1_decode(got_batch)
    assert got == want
