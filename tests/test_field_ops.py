"""Batched limb field arithmetic vs the Python-int oracle (naive-vs-fast)."""

import random

import numpy as np
import jax.numpy as jnp

from spartan_tpu.ops import field as f
from spartan_tpu.ops import limb as lb


def _rand_elems(spec, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(spec.modulus) for _ in range(n)]


def test_limb_codec_roundtrip():
    xs = _rand_elems(f.FR, 8, 1)
    arr = f.FR.enc(xs)
    assert arr.shape == (16, 8)
    assert f.FR.dec(arr) == xs


def test_carry_exact_matches_int():
    rng = random.Random(2)
    raw = np.array(
        [[rng.randrange(1 << 32) for _ in range(5)] for _ in range(10)],
        dtype=np.uint32,
    )
    out = np.asarray(lb.carry_exact(jnp.asarray(raw)))
    for j in range(5):
        val = sum(int(raw[i, j]) << (16 * i) for i in range(10))
        val %= 1 << 160
        got = sum(int(out[i, j]) << (16 * i) for i in range(10))
        assert got == val
        assert out[:, j].max() < (1 << 16)


def test_add_sub_neg():
    for spec in (f.FR, f.FP):
        m = spec.modulus
        xs = _rand_elems(spec, 6, 3) + [0, m - 1]
        ys = _rand_elems(spec, 6, 4) + [m - 1, m - 1]
        a, b = spec.enc(xs), spec.enc(ys)
        assert spec.dec(f.add(spec, a, b)) == [(x + y) % m for x, y in zip(xs, ys)]
        assert spec.dec(f.sub(spec, a, b)) == [(x - y) % m for x, y in zip(xs, ys)]
        assert spec.dec(f.neg(spec, a)) == [(-x) % m for x in xs]


def test_mont_mul_matches_oracle():
    for spec in (f.FR, f.FP):
        m = spec.modulus
        xs = _rand_elems(spec, 6, 5) + [0, m - 1]
        ys = _rand_elems(spec, 6, 6) + [m - 1, m - 1]
        am = f.encode_mont(spec, xs)
        bm = f.encode_mont(spec, ys)
        prod = f.mont_mul(spec, am, bm)
        assert f.decode_mont(spec, prod) == [x * y % m for x, y in zip(xs, ys)]


def test_mont_roundtrip_and_one():
    spec = f.FR
    xs = _rand_elems(spec, 4, 7)
    a = spec.enc(xs)
    am = f.to_mont(spec, a)
    back = f.from_mont(spec, am)
    assert spec.dec(back) == xs
    one = f.ones_mont(spec, (4,))
    assert f.decode_mont(spec, one) == [1, 1, 1, 1]
    # multiplying by one (Montgomery) is identity
    assert f.decode_mont(spec, f.mont_mul(spec, am, one)) == xs


def test_inv():
    spec = f.FR
    m = spec.modulus
    xs = _rand_elems(spec, 3, 8)
    am = f.encode_mont(spec, xs)
    got = f.decode_mont(spec, f.inv(spec, am))
    assert got == [pow(x, m - 2, m) for x in xs]


def test_reduce_wide_segment_sum():
    spec = f.FR
    m = spec.modulus
    rng = random.Random(9)
    # simulate a segment sum: 50 Montgomery values added limb-wise
    xs = [rng.randrange(m) for _ in range(50)]
    arr = np.asarray(f.encode_mont(spec, xs)).astype(np.uint32)
    acc = arr.sum(axis=1, dtype=np.uint64)  # limb-wise, may exceed u32? 50*2^16 < 2^32
    acc = jnp.asarray(acc.astype(np.uint32)).reshape(16, 1)
    red = f.reduce_wide(spec, acc)
    got = f.decode_mont(spec, red)
    assert got == [sum(xs) % m]
