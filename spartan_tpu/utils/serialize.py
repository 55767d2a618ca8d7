"""Canonical serialization, arkworks-layout compatible.

TPU-native equivalent of ``ark-serialize``'s CanonicalSerialize (reference:
derives on every message/key/proof, e.g. src/data_structures/proof.rs:10,
src/ahp/indexer.rs:10; the FS transcript absorbs these bytes,
src/lib.rs:62-65). Layout rules implemented (arkworks 2020 conventions):

- Fr, Fp: little-endian bytes of the canonical (non-Montgomery) integer,
  fixed width = ceil(modulus_bits / 8) rounded to the limb byte size the
  reference uses (32 bytes for Fr, 48 for Fp).
- usize: u64 little-endian.
- Vec<T>: u64 LE length prefix, then elements.
- tuples/structs: fields in declaration order.
- G1/G2 affine compressed: x-coordinate bytes (Fp LE; Fp2 as c0 || c1) with
  flag bits in the top bits of the LAST byte: bit7 = y is the
  lexicographically larger root, bit6 = point at infinity.

The exact bit-layout of the reference's 2020-era git snapshot cannot be
re-verified in this environment (no Rust toolchain, unpinned git deps —
SURVEY.md §6); all byte formats are centralized here so a future golden-vector
alignment is a one-file change. Prover and verifier both use this module, so
proofs are internally consistent regardless.
"""

from __future__ import annotations

import struct

from spartan_tpu.host import field as hf

FR_BYTES = 32
FP_BYTES = 48


def ser_u64(x: int) -> bytes:
    return struct.pack("<Q", x)


def ser_fr(x: int) -> bytes:
    return int(x % hf.R).to_bytes(FR_BYTES, "little")


def deser_fr(b: bytes, off: int = 0):
    return int.from_bytes(b[off : off + FR_BYTES], "little"), off + FR_BYTES


def ser_fr_vec(xs) -> bytes:
    return ser_u64(len(xs)) + b"".join(ser_fr(x) for x in xs)


def ser_matrix(rows) -> bytes:
    """Matrix<Fr> = Vec<Vec<(Fr, usize)>> (reference: ark_relations Matrix,
    absorbed whole into the FS transcript at src/lib.rs:62-64).

    Uses the native C++ serializer when available (O(nnz) bytes is the hot
    host path for large circuits); pure-Python fallback is bit-identical."""
    try:
        from spartan_tpu.host.native import ser_matrix_native

        fast = ser_matrix_native(rows)
        if fast is not None:
            return fast
    except Exception:
        pass
    return ser_matrix_py(rows)


def ser_matrix_py(rows) -> bytes:
    out = [ser_u64(len(rows))]
    for row in rows:
        out.append(ser_u64(len(row)))
        for coeff, idx in row:
            out.append(ser_fr(coeff))
            out.append(ser_u64(idx))
    return b"".join(out)


# -- group elements ---------------------------------------------------------


def _y_is_largest_fp(y: int) -> bool:
    return y > hf.P - y  # i.e. y > (p-1)/2 with y != 0


def ser_g1(pt) -> bytes:
    """G1 affine compressed: 48 bytes."""
    if pt is None:
        b = bytearray(FP_BYTES)
        b[-1] |= 0x40
        return bytes(b)
    x, y = pt
    b = bytearray(int(x).to_bytes(FP_BYTES, "little"))
    if _y_is_largest_fp(y):
        b[-1] |= 0x80
    return bytes(b)


def deser_g1(data: bytes, off: int = 0):
    """Inverse of ser_g1: recompute y from the curve equation."""
    raw = bytearray(data[off : off + FP_BYTES])
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    off += FP_BYTES
    if flags & 0x40:
        return None, off
    x = int.from_bytes(bytes(raw), "little")
    y2 = (x * x % hf.P * x + hf.B_G1) % hf.P
    y = _sqrt_fp(y2)
    if y is None:
        raise ValueError("invalid G1 x-coordinate")
    if _y_is_largest_fp(y) != bool(flags & 0x80):
        y = hf.P - y
    return (x, y), off


def ser_g2(pt) -> bytes:
    """G2 affine compressed: 96 bytes (x.c0 LE || x.c1 LE, flags on last byte)."""
    if pt is None:
        b = bytearray(2 * FP_BYTES)
        b[-1] |= 0x40
        return bytes(b)
    (x0, x1), (y0, y1) = pt
    b = bytearray(int(x0).to_bytes(FP_BYTES, "little") + int(x1).to_bytes(FP_BYTES, "little"))
    if _y2_is_largest((y0, y1)):
        b[-1] |= 0x80
    return bytes(b)


def deser_g2(data: bytes, off: int = 0):
    raw = bytearray(data[off : off + 2 * FP_BYTES])
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    off += 2 * FP_BYTES
    if flags & 0x40:
        return None, off
    x0 = int.from_bytes(bytes(raw[:FP_BYTES]), "little")
    x1 = int.from_bytes(bytes(raw[FP_BYTES:]), "little")
    x = (x0, x1)
    y2 = hf.fp2_add(hf.fp2_mul(hf.fp2_sq(x), x), hf.B_G2)
    y = _sqrt_fp2(y2)
    if y is None:
        raise ValueError("invalid G2 x-coordinate")
    if _y2_is_largest(y) != bool(flags & 0x80):
        y = hf.fp2_neg(y)
    return (x, y), off


def _y2_is_largest(y) -> bool:
    """Lexicographic order on (c1, c0)."""
    ny = hf.fp2_neg(y)
    return (y[1], y[0]) > (ny[1], ny[0])


def _sqrt_fp(a: int):
    """Square root in Fp (p ≡ 3 mod 4): a^((p+1)/4)."""
    r = pow(a, (hf.P + 1) // 4, hf.P)
    return r if r * r % hf.P == a % hf.P else None


def _sqrt_fp2(a):
    """Square root in Fp2 via the norm trick (p ≡ 3 mod 4)."""
    if a == hf.FP2_ZERO:
        return hf.FP2_ZERO
    a0, a1 = a
    if a1 == 0:
        s = _sqrt_fp(a0)
        if s is not None:
            return (s, 0)
        # sqrt of non-residue times u: a0 = -(t^2) -> sqrt = t*u
        s = _sqrt_fp((-a0) % hf.P)
        return None if s is None else (0, s)
    # norm = a0^2 + a1^2 must be a QR in Fp
    norm = (a0 * a0 + a1 * a1) % hf.P
    n = _sqrt_fp(norm)
    if n is None:
        return None
    for sign in (1, -1):
        alpha = (a0 + sign * n) % hf.P * pow(2, hf.P - 2, hf.P) % hf.P
        x0 = _sqrt_fp(alpha)
        if x0 is None:
            continue
        x1 = a1 * pow(2 * x0 % hf.P, hf.P - 2, hf.P) % hf.P
        if hf.fp2_sq((x0, x1)) == (a0 % hf.P, a1 % hf.P):
            return (x0, x1)
    return None
