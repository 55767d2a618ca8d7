"""Device-resident Fiat–Shamir: bit-equality with the host transcript.

The fused sumcheck phases (protocol/fused.py) only work if the on-device
Blake2s chain (ops/blake2s.py, ops/fs_device.py) produces byte-identical
transcripts to the host RNG (utils/transcript.py) that the verifier replays
— these tests pin that equality, including rejection-sampling paths.
"""

import hashlib
import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spartan_tpu.ops import fs_device as fsd
from spartan_tpu.ops.blake2s import blake2s_words
from spartan_tpu.utils.transcript import Blake2sRng


def _words(b: bytes):
    return jnp.asarray(np.frombuffer(b, dtype="<u4").copy())


@pytest.mark.parametrize("nwords", [0, 1, 8, 10, 15, 16, 17, 32, 40])
def test_blake2s_matches_hashlib(nwords):
    rng = random.Random(nwords)
    data = bytes(rng.randrange(256) for _ in range(4 * nwords))
    got = fsd.words_to_state(blake2s_words(_words(data)))
    assert got == hashlib.blake2s(data).digest()


def test_blake2s_batched():
    rng = random.Random(7)
    msgs = [bytes(rng.randrange(256) for _ in range(40)) for _ in range(5)]
    batch = jnp.stack([_words(m) for m in msgs])  # (5, 10)
    out = np.asarray(blake2s_words(batch))
    for i, m in enumerate(msgs):
        assert out[i].astype("<u4").tobytes() == hashlib.blake2s(m).digest()


def test_feed_sample_matches_host():
    """feed/sample interleavings, enough samples to exercise rejections."""
    host = Blake2sRng.setup()
    rng = random.Random(3)
    feed_a = bytes(rng.randrange(256) for _ in range(64))
    feed_b = bytes(rng.randrange(256) for _ in range(32))

    host.feed(feed_a)
    host_vals = [host.sample_fr() for _ in range(40)]
    host.feed(feed_b)
    host_vals += [host.sample_fr() for _ in range(10)]

    # device replay
    state = blake2s_words(_words(b""))  # setup state = blake2s("")
    state = fsd.fs_feed(state, _words(feed_a))
    limbs_a, _ = fsd.fs_sample_fr_n(state, jnp.uint32(0), 40)  # (16, 40)
    state = fsd.fs_feed(state, _words(feed_b))
    limbs_b, _ = fsd.fs_sample_fr_n(state, jnp.uint32(0), 10)
    arr = np.concatenate([np.asarray(limbs_a), np.asarray(limbs_b)], axis=-1)
    dev_vals = [
        int(sum(int(arr[i, j]) << (16 * i) for i in range(16)))
        for j in range(arr.shape[1])
    ]
    assert dev_vals == host_vals


def test_batched_sampling_lanes_independent():
    """Batched (B,8) states sample exactly what each lane samples alone."""
    feeds = [bytes([i]) * 36 for i in range(4)]
    states = []
    expect = []
    for f in feeds:
        host = Blake2sRng.setup()
        host.feed(f)
        expect.append([host.sample_fr() for _ in range(20)])
        s = blake2s_words(_words(b""))
        states.append(fsd.fs_feed(s, _words(f)))
    state = jnp.stack(states)  # (4, 8)
    ctr = jnp.zeros((4,), jnp.uint32)
    limbs, _ = fsd.fs_sample_fr_n(state, ctr, 20)  # (16, 4, 20)
    arr = np.asarray(limbs)
    got = [
        [
            int(sum(int(arr[i, lane, j]) << (16 * i) for i in range(16)))
            for j in range(20)
        ]
        for lane in range(4)
    ]
    assert got == expect


def test_set_state_roundtrip():
    host = Blake2sRng.setup()
    host.feed(b"a" * 32)
    st = host.get_state()
    other = Blake2sRng.setup()
    other.set_state(st)
    host.feed(b"b" * 32)
    other.feed(b"b" * 32)
    assert host.sample_fr() == other.sample_fr()


def test_fused_prove_bytes_equal_host_loop():
    """The fused device-FS prover emits the identical proof to the host loop."""
    from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
    from spartan_tpu.protocol.argument import MLArgumentForR1CS

    rng = random.Random(11)
    cs, v, w = generate_circuit_with_random_input(
        num_public=4, num_private=28, pad_to_square=True, density=2, rng=rng
    )
    a, b, c = cs.to_matrices()

    class _Rng:
        def __init__(self, seed):
            self._r = random.Random(seed)

        def sample_fr(self):
            from spartan_tpu.host import field as hf

            return self._r.randrange(hf.R)

    pp, vp = MLArgumentForR1CS.setup(5, _Rng(42))
    pk = MLArgumentForR1CS.index(a, b, c)

    old = os.environ.get("SPARTAN_DEVICE_FS")
    try:
        os.environ["SPARTAN_DEVICE_FS"] = "1"
        proof_fused = MLArgumentForR1CS.prove(pk, v, w, pp)
        os.environ["SPARTAN_DEVICE_FS"] = "0"
        proof_host = MLArgumentForR1CS.prove(pk, v, w, pp)
    finally:
        if old is None:
            os.environ.pop("SPARTAN_DEVICE_FS", None)
        else:
            os.environ["SPARTAN_DEVICE_FS"] = old

    assert proof_fused.serialize() == proof_host.serialize()
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof_fused, vp)
