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
