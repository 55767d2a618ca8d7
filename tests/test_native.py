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
