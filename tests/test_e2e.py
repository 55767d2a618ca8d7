"""End-to-end prove+verify (reference: src/ahp/tests.rs test_small and
src/benchmark.rs test_circuit, scaled to CI-friendly sizes)."""

import random

import pytest

from spartan_tpu.host import field as hf
from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.protocol.proof import Proof
from spartan_tpu.utils.errors import SpartanError


class _TestRng:
    def __init__(self, seed=0):
        self._r = random.Random(seed)

    def sample_fr(self):
        return self._r.randrange(hf.R)


LOG_N = 6
LOG_V = 2


@pytest.fixture(scope="module")
def instance():
    rng = random.Random(0)
    num_public = 1 << LOG_V
    num_private = (1 << LOG_N) - num_public
    cs, v, w = generate_circuit_with_random_input(
        num_public=num_public,
        num_private=num_private,
        pad_to_square=True,
        density=1,
        rng=rng,
    )
    assert cs.is_satisfied()
    a, b, c = cs.to_matrices()
    assert len(a) == 1 << LOG_N and len(v) + len(w) == 1 << LOG_N
    pp, vp = MLArgumentForR1CS.setup(LOG_N, _TestRng(42))
    pk = MLArgumentForR1CS.index(a, b, c)
    return pk, v, w, pp, vp


@pytest.fixture(scope="module")
def proof(instance):
    pk, v, w, pp, vp = instance
    return MLArgumentForR1CS.prove(pk, v, w, pp)


def test_prove_verify_roundtrip(instance, proof):
    pk, v, w, pp, vp = instance
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)


def test_proof_serialization_roundtrip(instance, proof):
    pk, v, w, pp, vp = instance
    data = proof.serialize()
    assert isinstance(data, bytes) and len(data) > 0
    proof2 = Proof.deserialize(data)
    assert proof2.serialize() == data
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof2, vp)


def test_verify_rejects_wrong_public_input(instance, proof):
    pk, v, w, pp, vp = instance
    v_bad = list(v)
    v_bad[1] = (v_bad[1] + 1) % hf.R
    with pytest.raises(SpartanError):
        MLArgumentForR1CS.verify(pk.vk(), v_bad, proof, vp)


def test_verify_rejects_tampered_proof(instance, proof):
    pk, v, w, pp, vp = instance
    data = bytearray(proof.serialize())
    # flip a low byte of z_rv_0 (after nv u64 + 48b commitment)
    data[8 + 48] ^= 1
    bad = Proof.deserialize(bytes(data))
    with pytest.raises(SpartanError):
        MLArgumentForR1CS.verify(pk.vk(), v, bad, vp)


def test_prove_rejects_bad_witness(instance):
    # The reference never tests rejection (SURVEY.md §4); we do: a wrong
    # witness must fail verification.
    pk, v, w, pp, vp = instance
    w_bad = list(w)
    w_bad[0] = (w_bad[0] + 1) % hf.R
    bad_proof = MLArgumentForR1CS.prove(pk, v, w_bad, pp)
    with pytest.raises(SpartanError):
        MLArgumentForR1CS.verify(pk.vk(), v, bad_proof, vp)


def test_verify_native_and_device_matrix_eval_agree(instance, proof, monkeypatch):
    """The native O(nnz) host matrix-eval path and the fused device program
    must accept the same proof (verifier.py verify_sixth_round routes on
    SPARTAN_NATIVE_VERIFY; both paths compute A/B/C(r_x, r_y))."""
    pk, v, w, pp, vp = instance
    monkeypatch.setenv("SPARTAN_NATIVE_VERIFY", "0")
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)
    monkeypatch.setenv("SPARTAN_NATIVE_VERIFY", "1")
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)
