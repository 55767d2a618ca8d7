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
    """0 = unbounded rejection sampling (lax.while_loop, exact); K > 0 =
    fixed K attempts under lax.fori_loop. A rejection needs a fresh draw with
    probability ~9.5% (masked 255-bit value >= r), so K attempts fail with
    probability 0.095^K per sample: the default 24 puts a full deviation from
    the host sampler at ~1e-25 per sample — and a deviation is loud (the
    replayed host transcript diverges, so verification fails), not silent.
    Bounded mode exists because deep while_loops inside scans hang flakily on
    the multi-(virtual-)device CPU runtime used in tests."""
    import os

    v = os.environ.get("SPARTAN_FS_MAX_ATTEMPTS", "24")
    return int(v)


def fs_sample_fr(state, counter):
    """Sample one uniform Fr element (rejection sampling).

    state: (8,) words; counter: uint32 scalar (next output-block index).
    Returns (limbs (16,) canonical, new counter). Batched variants stack the
    leading axis on state/counter.
    """
    bshape = state.shape[:-1]

    def draw(ctr):
        block = blake2s_words(
            jnp.concatenate([state, u64_words(ctr)], axis=-1)
        )  # (..., 8)
        limbs = words_to_limbs(block)  # (16, ...)
        limbs = limbs.at[15].set(limbs[15] & U32(0x7FFF))  # REPR_SHAVE_BITS=1
        return limbs, _limbs_lt_r(limbs)

    def cond(carry):
        _limbs, ok, _ctr = carry
        return ~jnp.all(ok)

    def body(carry):
        limbs, ok, ctr = carry
        new_limbs, new_ok = draw(ctr)
        take = (~ok) & new_ok  # lanes that just got their first accept
        limbs = jnp.where(take[None, ...], new_limbs, limbs)
        ctr = ctr + jnp.where(ok, U32(0), U32(1))
        return limbs, ok | new_ok, ctr

    init = (
        jnp.zeros((16,) + bshape, U32),
        jnp.zeros(bshape, bool),
        jnp.asarray(counter, U32) + jnp.zeros(bshape, U32),
    )
    k = _fs_attempts()
    if k:
        limbs, _ok, ctr = jax.lax.fori_loop(0, k, lambda _, c: body(c), init)
    else:
        limbs, _ok, ctr = jax.lax.while_loop(cond, body, init)
    return limbs, ctr


@partial(jax.jit, static_argnums=(2,))
def fs_sample_fr_n(state, counter, n: int):
    """n sequential Fr samples from one stream (jitted; body traces once).

    Returns (limbs (16, ..., n) canonical, new counter)."""

    def step(ctr, _):
        limbs, ctr = fs_sample_fr(state, ctr)
        return ctr, limbs

    counter, limbs = jax.lax.scan(step, jnp.asarray(counter, U32), None, length=n)
    return jnp.moveaxis(limbs, 0, -1), counter
