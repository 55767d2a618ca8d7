"""Device-resident Fiat–Shamir transcript primitives.

Same chain construction as the host RNG (utils/transcript.py — the TPU-native
stand-in for the reference's ``Blake2s512Rng``/``FeedableRNG``,
src/lib.rs:28,61-65), executed on device via ops/blake2s.py so that a whole
sumcheck phase (protocol/fused.py) runs without host round-trips:

  state <- blake2s(state || bytes)      feed  (resets the block counter)
  block_k = blake2s(state || LE64(k))   output stream
  sample_fr: draw one 32-byte block, mask to 255 bits, reject if >= r
             (arkworks UniformRand semantics; retry with the next block)

All values are uint32 words (little-endian byte order inside each word).
Every transcript message in this protocol is word-aligned, so byte lengths
are always 4 * word count. Bit-identical to the host implementation —
cross-checked in tests/test_fs_device.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.host import field as hf
from spartan_tpu.ops.blake2s import blake2s_words

U32 = jnp.uint32

# Fr modulus as 16x16-bit limbs (canonical), for the acceptance compare
_R_LIMBS = np.array(
    [(hf.R >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32
)


def state_to_words(state: bytes) -> jnp.ndarray:
    """Host 32-byte chain state -> (8,) uint32 device words."""
    return jnp.asarray(np.frombuffer(state, dtype="<u4").copy())


def words_to_state(words) -> bytes:
    """(8,) uint32 device words -> host 32-byte chain state."""
    return np.asarray(words).astype("<u4").tobytes()


def fs_feed(state, msg_words):
    """state (..., 8), msg_words (..., W) -> new state (..., 8)."""
    return blake2s_words(jnp.concatenate([state, msg_words], axis=-1))


def limbs_to_words(limbs):
    """Canonical Fr limbs (16, ...) -> serialization words (..., 8).

    Word j = limb[2j] | limb[2j+1] << 16 — exactly the 32-byte little-endian
    integer encoding of utils/serialize.ser_fr.
    """
    lo = limbs[0::2]  # (8, ...)
    hi = limbs[1::2]
    w = lo | (hi << U32(16))
    return jnp.moveaxis(w, 0, -1)  # (..., 8)


def words_to_limbs(words):
    """Digest words (..., 8) -> canonical 16-bit limbs (16, ...)."""
    w = jnp.moveaxis(words, -1, 0)  # (8, ...)
    lo = w & U32(0xFFFF)
    hi = w >> U32(16)
    limbs = jnp.stack([lo, hi], axis=1)  # (8, 2, ...)
    return limbs.reshape((16,) + words.shape[:-1])


def u64_words(value):
    """Traced uint32 scalar (or (...,) array) -> LE64 words (..., 2)."""
    v = jnp.asarray(value, dtype=U32)
    return jnp.stack([v, jnp.zeros_like(v)], axis=-1)


def _limbs_lt_r(limbs):
    """limbs (16, ...) canonical (after 255-bit mask) -> bool (...,): v < r."""
    r = _R_LIMBS
    lt = jnp.zeros(limbs.shape[1:], bool)
    eq = jnp.ones(limbs.shape[1:], bool)
    for i in range(15, -1, -1):
        ri = U32(int(r[i]))
        lt = lt | (eq & (limbs[i] < ri))
        eq = eq & (limbs[i] == ri)
    return lt


def _fs_attempts() -> int:
    """K candidate blocks drawn per sample (one batched Blake2s call). A
    rejection needs a fresh draw with probability ~9.5% (masked 255-bit value
    >= r), so K candidates fail with probability 0.095^K per sample: the
    default 24 puts a full deviation from the host sampler at ~1e-25 per
    sample — and a deviation is loud (the replayed host transcript diverges,
    so verification fails), not silent. Earlier rounds used a sequential
    fori/while retry loop here; loops-in-scans hang the multi-(virtual-)device
    CPU runtime and bloat compiles, so all K candidates are now hashed in one
    vectorized pass and the first acceptable one selected."""
    import os

    v = int(os.environ.get("SPARTAN_FS_MAX_ATTEMPTS", "24"))
    return v if v > 0 else 24


def fs_sample_fr(state, counter):
    """Sample one uniform Fr element (rejection sampling).

    state: (..., 8) words; counter: uint32 scalar or (...,) array (next
    output-block index). Returns (limbs (16, ...) canonical, new counter).

    Draws K candidate blocks at counters ctr..ctr+K-1 in ONE batched Blake2s
    call and keeps the first with value < r — identical bytes/counter
    consumption to sequential rejection sampling whenever any of the K
    candidates is acceptable (always, up to probability 0.095^K)."""
    bshape = state.shape[:-1]
    k = _fs_attempts()

    ctr = jnp.asarray(counter, U32) + jnp.zeros(bshape, U32)  # (...,)
    ctrs = ctr[..., None] + jnp.arange(k, dtype=U32)  # (..., K)
    inp = jnp.concatenate(
        [
            jnp.broadcast_to(state[..., None, :], bshape + (k, 8)),
            u64_words(ctrs),
        ],
        axis=-1,
    )  # (..., K, 10)
    blocks = blake2s_words(inp)  # (..., K, 8)
    limbs = words_to_limbs(blocks)  # (16, ..., K)
    limbs = limbs.at[15].set(limbs[15] & U32(0x7FFF))  # REPR_SHAVE_BITS=1
    ok = _limbs_lt_r(limbs)  # (..., K)
    first = jnp.argmax(ok, axis=-1)  # first acceptable candidate per lane
    sel = jnp.take_along_axis(
        limbs, first[None, ..., None].astype(jnp.int32), axis=-1
    )[..., 0]  # (16, ...)
    new_ctr = ctr + first.astype(U32) + U32(1)
    return sel, new_ctr


@partial(jax.jit, static_argnums=(2,))
def fs_sample_fr_n(state, counter, n: int):
    """n sequential Fr samples from one stream (jitted; body traces once).

    Returns (limbs (16, ..., n) canonical, new counter)."""

    def step(ctr, _):
        limbs, ctr = fs_sample_fr(state, ctr)
        return ctr, limbs

    counter, limbs = jax.lax.scan(step, jnp.asarray(counter, U32), None, length=n)
    return jnp.moveaxis(limbs, 0, -1), counter
