"""Native C++ host runtime vs pure-Python: bit-identical behavior."""

import hashlib
import random

import pytest

from spartan_tpu.host import native as nat
from spartan_tpu.utils import serialize as ser
from spartan_tpu.utils import transcript as tr


@pytest.fixture(scope="module")
def lib():
    l = nat.load()
    if l is None:
        pytest.skip("native build unavailable")
    return l


def test_blake2s_matches_hashlib(lib):
    import ctypes

    for data in [b"", b"abc", bytes(range(256)) * 5]:
        out = ctypes.create_string_buffer(32)
        lib.spartan_blake2s(data, len(data), out)
        assert out.raw == hashlib.blake2s(data).digest()


def test_fs_rng_matches_python(lib):
    native = nat.NativeFsRng(lib)
    py = tr.Blake2sRng()
    py._native = None  # force pure-python path
    for feed in [b"seed", b"round-1", b""]:
        native.feed(feed)
        py.feed(feed)
        assert native.next_bytes(40) == py.next_bytes(40)
        assert native.next_u64() == py.next_u64()


def test_ser_matrix_matches_python(lib):
    rng = random.Random(0)
    rows = []
    for _ in range(17):
        row = [
            (rng.randrange(1 << 255), rng.randrange(1 << 10))
            for _ in range(rng.randrange(0, 5))
        ]
        rows.append(row)
    fast = nat.ser_matrix_native(rows)
    assert fast == ser.ser_matrix_py(rows)


def test_transcript_uses_native_transparently():
    # The public Blake2sRng must behave identically whether or not the
    # native library loaded.
    a = tr.Blake2sRng.setup()
    b = tr.Blake2sRng.setup()
    b._native = None
    a.feed(b"x")
    b.feed(b"x")
    assert a.sample_fr() == b.sample_fr()
    assert a.sample_fr_vec(3) == b.sample_fr_vec(3)


def test_pairing_product_matches_python(lib):
    from spartan_tpu.host import curve as hc
    from spartan_tpu.host import field as hf
    from spartan_tpu.host import pairing as hp

    rng = random.Random(11)
    p = hc.G1.mul(hf.G1_GEN, rng.randrange(hf.R))
    q = hc.G2.mul(hf.G2_GEN, rng.randrange(hf.R))
    # single pairing, bit-identical to the affine/untwist oracle
    assert nat.pairing_product_native([(p, q)]) == hp.pairing_py(p, q)
    # product with shared final exponentiation
    pairs = [
        (
            hc.G1.mul(hf.G1_GEN, rng.randrange(hf.R)),
            hc.G2.mul(hf.G2_GEN, rng.randrange(hf.R)),
        )
        for _ in range(4)
    ]
    assert nat.pairing_product_native(pairs) == hp.product_of_pairings_py(pairs)
    # infinity pairs contribute the identity
    assert nat.pairing_product_native(
        [(None, q), (p, q)]
    ) == hp.pairing_py(p, q)


def test_pairing_bilinearity_native(lib):
    from spartan_tpu.host import curve as hc
    from spartan_tpu.host import field as hf
    from spartan_tpu.host import pairing as hp

    rng = random.Random(12)
    a, b = rng.randrange(hf.R), rng.randrange(hf.R)
    pa = hc.G1.mul(hf.G1_GEN, a)
    qb = hc.G2.mul(hf.G2_GEN, b)
    pab = hc.G1.mul(hf.G1_GEN, a * b % hf.R)
    assert hp.pairing(pa, qb) == hp.pairing(pab, hf.G2_GEN)


def test_g1_lincomb_matches_python(lib):
    from spartan_tpu.host import curve as hc
    from spartan_tpu.host import field as hf

    rng = random.Random(13)
    pts = [hc.G1.mul(hf.G1_GEN, rng.randrange(hf.R)) for _ in range(5)]
    ss = [rng.randrange(hf.R) for _ in range(5)]
    acc = None
    for pt, s in zip(pts, ss):
        acc = hc.G1.add(acc, hc.G1.mul(pt, s))
    assert nat.g1_lincomb_native(pts, ss) == acc
    assert hc.g1_lincomb(pts, ss) == acc
    # cancellation to infinity
    assert (
        nat.g1_lincomb_native([pts[0], pts[0]], [ss[0], hf.R - ss[0]])
        is nat.INF_POINT
    )
    assert hc.g1_lincomb([pts[0], pts[0]], [ss[0], hf.R - ss[0]]) is None
    # zero scalars and infinity inputs are skipped
    assert nat.g1_lincomb_native([None, pts[1]], [ss[0], 0]) is nat.INF_POINT


def test_matrix_eval_matches_oracle(lib):
    from spartan_tpu.host import field as hf
    from spartan_tpu.protocol.indexer import MatrixExtension

    rng = random.Random(21)
    log_n = 4
    n = 1 << log_n
    rows = [
        [(rng.randrange(hf.R), rng.randrange(n)) for _ in range(rng.randrange(0, 4))]
        for _ in range(n)
    ]
    m = MatrixExtension.new(rows, n)
    rx = [rng.randrange(hf.R) for _ in range(log_n)]
    ry = [rng.randrange(hf.R) for _ in range(log_n)]

    def eq_tab(pt):
        t = [1]
        for r in pt:
            t = [x * (1 - r) % hf.R for x in t] + [x * r % hf.R for x in t]
        return t

    ex, ey = eq_tab(rx), eq_tab(ry)
    want = 0
    for r, row in enumerate(rows):
        for coeff, c in row:
            want = (want + coeff * ex[r] % hf.R * ey[c]) % hf.R
    assert nat.matrix_eval_native(m.serialize(), rx, ry, log_n) == want
    # malformed input is rejected, not misread
    with pytest.raises(ValueError):
        nat.matrix_eval_native(b"\x00" * 4, rx, ry, log_n)
