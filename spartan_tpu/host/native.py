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
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _BUILD.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
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
