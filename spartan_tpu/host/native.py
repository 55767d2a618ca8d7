"""ctypes loader for the native C++ host runtime (native/spartan_host.cpp).

Builds lazily with g++ (cached .so under native/build/); falls back cleanly
to the pure-Python implementations when no compiler is available. The native
and Python paths are bit-identical (cross-checked in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _ROOT / "native" / "spartan_host.cpp"
_SRCS = [
    _ROOT / "native" / "spartan_host.cpp",
    _ROOT / "native" / "spartan_pairing.cpp",
]
_HDRS = [_ROOT / "native" / "pairing_constants.h"]
_BUILD = _ROOT / "native" / "build"
_SO = _BUILD / "libspartan_host.so"

_lib = None
_tried = False


def load():
    """Return the loaded ctypes library, building if needed; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        newest_src = max(p.stat().st_mtime for p in _SRCS + _HDRS)
        if not _SO.exists() or _SO.stat().st_mtime < newest_src:
            _BUILD.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO)]
                + [str(s) for s in _SRCS],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.spartan_blake2s.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p
        ]
        lib.spartan_fs_new.restype = ctypes.c_void_p
        lib.spartan_fs_free.argtypes = [ctypes.c_void_p]
        lib.spartan_fs_feed.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64
        ]
        lib.spartan_fs_next_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64
        ]
        lib.spartan_fs_set_state.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.spartan_fs_get_state.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.spartan_ser_matrix.restype = ctypes.c_uint64
        lib.spartan_ser_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64, ctypes.c_char_p,
        ]
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.spartan_pairing_product.argtypes = [
            u64p, u64p, ctypes.c_char_p, ctypes.c_uint64, u64p
        ]
        lib.spartan_g1_lincomb.restype = ctypes.c_uint8
        lib.spartan_g1_lincomb.argtypes = [
            u64p, ctypes.c_char_p, u64p, ctypes.c_uint64, u64p
        ]
        lib.spartan_matrix_eval.restype = ctypes.c_int32
        lib.spartan_matrix_eval.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p,
        ]
        lib.spartan_matrix_eval3.restype = ctypes.c_int32
        lib.spartan_matrix_eval3.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class NativeFsRng:
    """Native Blake2s FS transcript; API mirrors utils.transcript.Blake2sRng."""

    def __init__(self, lib):
        self._lib = lib
        self._ptr = lib.spartan_fs_new()

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.spartan_fs_free(self._ptr)
            self._ptr = None

    def feed(self, data: bytes) -> None:
        self._lib.spartan_fs_feed(self._ptr, data, len(data))

    def next_bytes(self, n: int) -> bytes:
        out = ctypes.create_string_buffer(n)
        self._lib.spartan_fs_next_bytes(self._ptr, out, n)
        return out.raw

    def next_u64(self) -> int:
        return int.from_bytes(self.next_bytes(8), "little")

    def set_state(self, state: bytes) -> None:
        assert len(state) == 32
        self._lib.spartan_fs_set_state(self._ptr, state)

    def get_state(self) -> bytes:
        out = ctypes.create_string_buffer(32)
        self._lib.spartan_fs_get_state(self._ptr, out)
        return out.raw


def _fp_limbs(v: int, buf: bytearray, off: int) -> None:
    buf[off : off + 48] = int(v).to_bytes(48, "little")


def pairing_product_native(pairs):
    """prod_i e(P_i, Q_i) via the native tower; None if lib unavailable.

    pairs: [(g1_affine | None, g2_affine | None), ...] with the host tuple
    representation of host/curve.py. Returns the Fp12 nested-tuple form of
    host/field.py (so results compare equal against the Python oracle).
    """
    lib = load()
    if lib is None:
        return None
    n = len(pairs)
    g1 = bytearray(96 * n)
    g2 = bytearray(192 * n)
    inf = bytearray(n)
    for i, (p, q) in enumerate(pairs):
        if p is None or q is None:
            inf[i] = 1
            continue
        _fp_limbs(p[0], g1, 96 * i)
        _fp_limbs(p[1], g1, 96 * i + 48)
        (qx0, qx1), (qy0, qy1) = q
        _fp_limbs(qx0, g2, 192 * i)
        _fp_limbs(qx1, g2, 192 * i + 48)
        _fp_limbs(qy0, g2, 192 * i + 96)
        _fp_limbs(qy1, g2, 192 * i + 144)
    out = (ctypes.c_uint64 * 72)()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.spartan_pairing_product(
        ctypes.cast(ctypes.c_char_p(bytes(g1)), u64p),
        ctypes.cast(ctypes.c_char_p(bytes(g2)), u64p),
        bytes(inf), n, out,
    )
    raw = bytes(out)
    fps = [int.from_bytes(raw[48 * i : 48 * (i + 1)], "little") for i in range(12)]
    fp6_0 = ((fps[0], fps[1]), (fps[2], fps[3]), (fps[4], fps[5]))
    fp6_1 = ((fps[6], fps[7]), (fps[8], fps[9]), (fps[10], fps[11]))
    return (fp6_0, fp6_1)


INF_POINT = object()  # g1_lincomb_native's "point at infinity" result marker
# (distinct from None, which signals "native library unavailable")


def g1_lincomb_native(points, scalars):
    """sum_i s_i * P_i over G1 (affine host tuples); None if lib unavailable."""
    lib = load()
    if lib is None:
        return None
    from spartan_tpu.host.field import R

    n = len(points)
    pts = bytearray(96 * n)
    scal = bytearray(32 * n)
    inf = bytearray(n)
    for i, (p, s) in enumerate(zip(points, scalars)):
        if p is None or s % R == 0:
            inf[i] = 1
            continue
        _fp_limbs(p[0], pts, 96 * i)
        _fp_limbs(p[1], pts, 96 * i + 48)
        scal[32 * i : 32 * i + 32] = (s % R).to_bytes(32, "little")
    out = (ctypes.c_uint64 * 12)()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    is_inf = lib.spartan_g1_lincomb(
        ctypes.cast(ctypes.c_char_p(bytes(pts)), u64p),
        bytes(inf),
        ctypes.cast(ctypes.c_char_p(bytes(scal)), u64p),
        n, out,
    )
    if is_inf:
        return INF_POINT
    raw = bytes(out)
    return (
        int.from_bytes(raw[:48], "little"),
        int.from_bytes(raw[48:96], "little"),
    )


def matrix_eval_native(ser_bytes: bytes, rx, ry, log_n: int):
    """M(rx, ry) for a sparse matrix in ser_matrix wire layout; None if the
    native library is unavailable. rx/ry: lists of log_n ints. Returns a
    canonical Fr int. The O(nnz) walk matches the reference verifier's
    host-side matrix evaluation (src/ahp/verifier.rs:493-495)."""
    lib = load()
    if lib is None:
        return None
    from spartan_tpu.host.field import R

    rx_b = b"".join((int(x) % R).to_bytes(32, "little") for x in rx)
    ry_b = b"".join((int(y) % R).to_bytes(32, "little") for y in ry)
    out = ctypes.create_string_buffer(32)
    rc = lib.spartan_matrix_eval(
        ser_bytes, len(ser_bytes), rx_b, ry_b, log_n, out
    )
    if rc != 0:
        raise ValueError(f"spartan_matrix_eval: malformed input (rc={rc})")
    return int.from_bytes(out.raw, "little")


def matrix_eval3_native(ser_a: bytes, ser_b: bytes, ser_c: bytes, rx, ry,
                        log_n: int):
    """(A, B, C)(rx, ry) in one native call sharing the two eq tables
    (3x fewer table builds than three matrix_eval_native calls); None if
    the native library is unavailable. Returns three canonical Fr ints."""
    lib = load()
    if lib is None:
        return None
    from spartan_tpu.host.field import R

    rx_b = b"".join((int(x) % R).to_bytes(32, "little") for x in rx)
    ry_b = b"".join((int(y) % R).to_bytes(32, "little") for y in ry)
    out = ctypes.create_string_buffer(96)
    rc = lib.spartan_matrix_eval3(
        ser_a, len(ser_a), ser_b, len(ser_b), ser_c, len(ser_c),
        rx_b, ry_b, log_n, out,
    )
    if rc != 0:
        raise ValueError(f"spartan_matrix_eval3: malformed input (rc={rc})")
    return tuple(
        int.from_bytes(out.raw[32 * i : 32 * (i + 1)], "little")
        for i in range(3)
    )


def ser_matrix_native(rows) -> bytes | None:
    """Native fast path for utils.serialize.ser_matrix. None if unavailable."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    from spartan_tpu.host.field import R

    counts = np.array([len(r) for r in rows], dtype=np.uint64)
    nnz = int(counts.sum())
    coeffs = bytearray(32 * nnz)
    cols = np.empty(nnz, dtype=np.uint64)
    e = 0
    for row in rows:
        for coeff, idx in row:
            coeffs[32 * e : 32 * e + 32] = (int(coeff) % R).to_bytes(32, "little")
            cols[e] = idx
            e += 1
    size = lib.spartan_ser_matrix(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(rows),
        None, None, nnz, None,
    )
    out = ctypes.create_string_buffer(int(size))
    lib.spartan_ser_matrix(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(rows),
        bytes(coeffs), cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        nnz, out,
    )
    return out.raw
