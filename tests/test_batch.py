"""Batched proving: multiple instances of one circuit, shared kernels."""

import random

from spartan_tpu.host import field as hf
from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.protocol.batched import prove_batch, verify_batch


class _Rng:
    def __init__(self, seed=0):
        self._r = random.Random(seed)

    def sample_fr(self):
        return self._r.randrange(hf.R)


def test_prove_batch_roundtrip():
    log_n, log_v = 4, 2
    # same circuit shape, different witnesses: re-synthesize with fresh seeds
    # (assignments differ; matrices share the fixed synthesizer structure
    # only if the rng draws match, so index each instance's own matrices and
    # use the first instance's pk for all -- requires identical structure).
    rng = random.Random(3)
    cs, v, w = generate_circuit_with_random_input(
        num_public=1 << log_v,
        num_private=(1 << log_n) - (1 << log_v),
        pad_to_square=True,
        density=1,
        rng=rng,
    )
    a, b, c = cs.to_matrices()
    pp, vp = MLArgumentForR1CS.setup(log_n, _Rng(11))
    pk = MLArgumentForR1CS.index(a, b, c)

    # instances: same matrices, satisfying assignments. The dummy-padded
    # witness rows (0*0=0) let us vary padding witness values freely; here we
    # simply prove the same assignment twice plus a copy — exercising the
    # batch path and kernel reuse.
    instances = [(v, w), (v, list(w)), (v, w)]
    proofs = prove_batch(pk, instances, pp)
    assert len(proofs) == 3
    results = verify_batch(pk.vk(), instances, proofs, vp)
    assert results == [True, True, True]
    # proofs over identical instances with deterministic FS are identical
    assert proofs[0].serialize() == proofs[1].serialize()


def test_prove_many_bit_identical():
    """Batched device proving emits byte-identical proofs to prove().

    CI-sized (2^3, B=2): the (16, B, N) batched program family compiles its
    own phases, which blew the CPU-suite cap at 2^4 B=3 (round-3 verdict);
    the full-size throughput run lives in scripts/measure_batched.py /
    docs/PERF.md, executed on the TPU where compiles are shared and cheap
    relative to the work.
    """
    from spartan_tpu.protocol.batched import prove_many

    log_n, log_v = 3, 2
    rng = random.Random(5)
    cs, v, w = generate_circuit_with_random_input(
        num_public=1 << log_v,
        num_private=(1 << log_n) - (1 << log_v),
        pad_to_square=True,
        density=1,
        rng=rng,
    )
    a, b, c = cs.to_matrices()
    pp, vp = MLArgumentForR1CS.setup(log_n, _Rng(11))
    pk = MLArgumentForR1CS.index(a, b, c)

    # make genuinely distinct instances by varying *free* witness variables
    # (columns referenced by no matrix entry impose no constraint)
    used = set()
    for m in (a, b, c):
        for row in m:
            used.update(idx for _, idx in row)
    free = [
        i - len(v) for i in range(len(v), len(v) + len(w)) if i not in used
    ]
    instances = [(v, list(w)), (v, list(w))]
    for k, fi in enumerate(free[: len(instances)]):
        for j in range(k + 1):
            instances[k][1][fi] = (j + 7) % hf.R
    proofs_b = prove_many(pk, instances, pp)
    for (vi, wi), pb in zip(instances, proofs_b):
        p1 = MLArgumentForR1CS.prove(pk, vi, wi, pp)
        assert pb.serialize() == p1.serialize()
        assert MLArgumentForR1CS.verify(pk.vk(), vi, pb, vp)
