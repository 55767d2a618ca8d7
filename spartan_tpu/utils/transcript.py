"""Fiat–Shamir transcript RNG (Blake2s-based, feedable).

TPU-native equivalent of ``linear_sumcheck::data_structures::Blake2s512Rng``
with the ``FeedableRNG`` trait (reference use: src/lib.rs:28,61-65 — the
driver seeds it with the serialized A, B, C matrices and the public input,
then re-feeds every prover message between rounds). Fiat–Shamir is inherently
sequential and tiny, so it lives on the host; only sampled field elements
cross to the device.

Construction (documented reconstruction — the 2020 git snapshot of the Rust
crate is not vendored here, so byte-level equality with it is *not* claimed;
both our prover and verifier use this implementation, which is what
soundness/completeness of the non-interactive argument requires):

  state <- blake2s(b"")                      on setup()
  state <- blake2s(state || bytes)           on feed(bytes); resets counter
  block_k = blake2s(state || LE64(k))        output stream, k = 0,1,2,...

Field sampling mirrors arkworks ``UniformRand`` for Fr: draw 4 LE u64 limbs,
mask the top bit down to the 255-bit modulus width, reject-and-retry if the
value is >= r.
"""

from __future__ import annotations

import hashlib

from spartan_tpu.host import field as hf

_FR_SHAVE_MASK = (1 << 255) - 1  # REPR_SHAVE_BITS = 1 for BLS12-381 Fr


def _blake2s(data: bytes) -> bytes:
    return hashlib.blake2s(data).digest()


class Blake2sRng:
    """Feedable Fiat–Shamir RNG (host-side).

    Uses the native C++ runtime (host/native.py) when available — bit-
    identical to this pure-Python implementation (cross-checked in tests) —
    because transcript absorption is O(serialized matrix bytes).
    """

    def __init__(self):
        self._native = None
        try:
            from spartan_tpu.host import native as _nat

            lib = _nat.load()
            if lib is not None:
                self._native = _nat.NativeFsRng(lib)
        except Exception:
            self._native = None
        self._state = _blake2s(b"")
        self._counter = 0
        self._buffer = b""

    @classmethod
    def setup(cls) -> "Blake2sRng":
        return cls()

    def feed(self, data: bytes) -> None:
        """Absorb serialized bytes (CanonicalSerialize output)."""
        if self._native is not None:
            self._native.feed(data)
            return
        self._state = _blake2s(self._state + data)
        self._counter = 0
        self._buffer = b""

    # -- device handoff ------------------------------------------------------
    def get_state(self) -> bytes:
        """32-byte chain state (for the device-resident transcript kernels).

        Only valid at a feed boundary (no partially-consumed output block),
        which is the only place the protocol hands off to the device.
        """
        if self._native is not None:
            return self._native.get_state()
        return self._state

    def set_state(self, state: bytes) -> None:
        """Resume from a device-advanced chain state; resets the stream."""
        assert len(state) == 32
        if self._native is not None:
            self._native.set_state(state)
            return
        self._state = state
        self._counter = 0
        self._buffer = b""

    # -- RngCore -----------------------------------------------------------
    def _refill(self) -> None:
        block = _blake2s(self._state + self._counter.to_bytes(8, "little"))
        self._counter += 1
        self._buffer += block

    def next_bytes(self, n: int) -> bytes:
        if self._native is not None:
            return self._native.next_bytes(n)
        while len(self._buffer) < n:
            self._refill()
        out, self._buffer = self._buffer[:n], self._buffer[n:]
        return out

    def next_u64(self) -> int:
        return int.from_bytes(self.next_bytes(8), "little")

    # -- field sampling ----------------------------------------------------
    def sample_fr(self) -> int:
        """arkworks-style rejection sampling of a uniform Fr element."""
        while True:
            limbs = [self.next_u64() for _ in range(4)]
            val = sum(l << (64 * i) for i, l in enumerate(limbs))
            val &= _FR_SHAVE_MASK
            if val < hf.R:
                return val

    def sample_fr_vec(self, n: int):
        return [self.sample_fr() for _ in range(n)]
