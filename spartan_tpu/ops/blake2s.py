"""Blake2s-256 on device (JAX uint32 ops) for the device-resident transcript.

The Fiat–Shamir loop is the only reason a sumcheck round needs a host
round-trip (reference: the NI driver re-feeds every prover message into the
Blake2s RNG between rounds, src/lib.rs:74-134). Implementing Blake2s directly
in JAX lets an entire sumcheck phase — fold, evaluate, serialize, absorb,
sample — run as ONE device dispatch (see ops/fs_device.py), which matters on
a high-latency TPU tunnel where each host sync costs more than the round's
arithmetic.

Bit-identical to ``hashlib.blake2s`` (digest_size=32, no key); cross-checked
in tests/test_fs_device.py. Messages are uint32 word arrays (little-endian
byte order within each word) with a static byte length — every transcript
feed in this protocol is word-aligned (Fr = 32 bytes, u64 prefixes = 8).
All ops are scalar uint32 adds/xors/rotates: negligible FLOPs, fully traced,
no data-dependent control flow.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32

_IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

_SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    ],
    dtype=np.int32,
)


def _rotr(x, n: int):
    return (x >> U32(n)) | (x << U32(32 - n))


def _g_vec(a, b, c, d, x, y):
    """The Blake2s G mix on (4, ...) row vectors — 4 quads at once."""
    a = a + b + x
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + y
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _compress(h, m, t, last: bool):
    """One Blake2s compression. h: list of 8 (...,) uint32; m: list of 16;
    t: byte counter (Python int or traced uint32 — messages < 4 GiB).

    The working state is a (4 rows, 4 cols, ...) array: the 8 G mixes per
    round collapse to ONE vectorized column step and ONE diagonal step (rows
    rotated into alignment), and the 10 rounds run under lax.scan with the
    sigma-permuted message words pre-gathered — so the traced body is ~60 ops
    instead of ~1000. Fully unrolled, every Fiat–Shamir feed/sample call site
    inlined a ~0.3 MB HLO blob and transcript programs took minutes to
    compile (the round-3 lesson). Bit-identical to hashlib.blake2s.
    """
    bshape = h[0].shape
    iv = [jnp.broadcast_to(U32(x), bshape) for x in _IV]
    v12 = iv[4] ^ jnp.asarray(t, U32)
    v14 = iv[6] ^ U32(0xFFFFFFFF) if last else iv[6]
    v = jnp.stack(
        [
            jnp.stack(h[0:4]),
            jnp.stack(h[4:8]),
            jnp.stack(iv[0:4]),
            jnp.stack([v12, iv[5], v14, iv[7]]),
        ]
    )  # (4, 4, ...): flat index i -> (row i//4, col i%4)

    m_arr = jnp.stack(m)  # (16, ...)
    msel = jnp.take(m_arr, jnp.asarray(_SIGMA), axis=0)  # (10, 16, ...)

    def round_step(v, ms):
        # column step: quads (0,4,8,12)..(3,7,11,15) = the 4 columns
        a, b, c, d = v[0], v[1], v[2], v[3]
        a, b, c, d = _g_vec(a, b, c, d, ms[0:8:2], ms[1:8:2])
        # diagonal step: quads (0,5,10,15).. — rotate rows into alignment
        b, c, d = (
            jnp.roll(b, -1, axis=0),
            jnp.roll(c, -2, axis=0),
            jnp.roll(d, -3, axis=0),
        )
        a, b, c, d = _g_vec(a, b, c, d, ms[8:16:2], ms[9:16:2])
        b, c, d = (
            jnp.roll(b, 1, axis=0),
            jnp.roll(c, 2, axis=0),
            jnp.roll(d, 3, axis=0),
        )
        return jnp.stack([a, b, c, d]), None

    v, _ = jax.lax.scan(round_step, v, msel)
    out = jnp.stack(h[0:4] + h[4:8]).reshape(v[0:2].shape) ^ v[0:2] ^ v[2:4]
    return [out[i, j] for i in range(2) for j in range(4)]


def blake2s_words(msg):
    """Blake2s-256 of a word-aligned message.

    msg: (..., W) uint32 array, byte length = 4*W (static). Returns (..., 8)
    uint32 digest words. Batch dims broadcast through.

    Non-final blocks run under lax.scan so the compression traces once per
    call site regardless of message length (the fused sumcheck phases hash a
    ~500-byte message per round; unrolling every block made compiles slow).
    """
    msg = jnp.asarray(msg, dtype=U32)
    nwords = msg.shape[-1]
    nbytes = 4 * nwords
    bshape = msg.shape[:-1]
    h = [jnp.broadcast_to(U32(x), bshape) for x in _IV]
    h[0] = h[0] ^ U32(0x01010020)  # digest_length=32, fanout=1, depth=1

    nblocks = max(1, (nwords + 15) // 16)
    if nblocks > 1:
        body_words = msg[..., : (nblocks - 1) * 16]
        # (..., nblocks-1, 16) -> scan axis first
        blocks = jnp.moveaxis(
            body_words.reshape(bshape + (nblocks - 1, 16)), -2, 0
        )
        idx = jnp.arange(1, nblocks, dtype=U32) * U32(64)

        def step(hs, blk_t):
            blk, t = blk_t
            m = [blk[..., j] for j in range(16)]
            return tuple(_compress(list(hs), m, t, False)), None

        h, _ = jax.lax.scan(step, tuple(h), (blocks, idx))
        h = list(h)

    # final (possibly partial) block, zero-padded
    tail = msg[..., (nblocks - 1) * 16 :]
    pad = nblocks * 16 - nwords
    if pad:
        tail = jnp.concatenate(
            [tail, jnp.zeros(bshape + (pad,), U32)], axis=-1
        )
    m = [tail[..., j] for j in range(16)]
    h = _compress(h, m, nbytes, True)
    return jnp.stack(h, axis=-1)
