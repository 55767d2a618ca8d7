"""Mesh-sharded end-to-end prover: ``MLArgumentForR1CS.prove(..., mesh=...)``.

Scale-out driver for the hypercube-sharded kernels in parallel/sharded.py
(SURVEY.md §2.3 — the reference is single-threaded; this axis is new design):

- commit and the large opening levels run the point-range-sharded Pippenger
  (``make_sharded_msm``): local MSM per device + all-gather + tree reduce.
- both sumchecks run the hypercube-sharded round kernels: tables sharded over
  the evaluation axis, each round psums 3 partial sums over ICI. Once the
  per-device table would drop below one entry, tables are gathered and the
  tail runs single-device (widths < 2*D — negligible work).
- Fiat–Shamir runs on host (utils/transcript.Blake2sRng): challenges are
  host ints, so the transcript bytes are identical to the single-device
  prover's — cross-shard sums are exact mod r, making the PROOF byte-identical
  at any device count (asserted in tests/test_parallel.py).

The verifier is unchanged (host-side, argument.MLArgumentForR1CS.verify).
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.commitment import PublicParameter
from spartan_tpu.commitment.data_structures import Commitment, OpenProof
from spartan_tpu.commitment import scheme
from spartan_tpu.host import field as hf
from spartan_tpu.ops import curve as cv
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import mle
from spartan_tpu.ops import msm as msm_mod
from spartan_tpu.ops import sumcheck as sck
from spartan_tpu.ops.field import FR
from spartan_tpu.parallel import sharded
from spartan_tpu.protocol import prover as pr
from spartan_tpu.protocol import sumcheck as sc
from spartan_tpu.protocol import verifier as vr
from spartan_tpu.protocol.indexer import IndexPK
from spartan_tpu.protocol.proof import Proof
from spartan_tpu.utils import serialize as ser
from spartan_tpu.utils.errors import invalid_arg
from spartan_tpu.utils.timers import span
from spartan_tpu.utils.transcript import Blake2sRng


def _mesh_size(mesh) -> int:
    return int(np.prod(mesh.devices.shape))


def sharded_commit(pp: PublicParameter, poly, mesh) -> Commitment:
    """Point-range-sharded commit MSM (reference commit.rs:17-29)."""
    nv = int(poly.shape[1]).bit_length() - 1
    if nv != pp.nv:
        raise invalid_arg("polynomial nv mismatch with public parameter")
    scalars = fo.from_mont(FR, poly)
    msm_sh = sharded.make_sharded_msm(mesh, "fp")
    res = msm_sh(
        sharded.shard_points(mesh, pp.powers_of_g[0]),
        sharded.shard_table(mesh, scalars),
    )
    return Commitment(nv=nv, g_product=cv.g1_decode(res)[0])


def sharded_open(pp: PublicParameter, poly, point: List[int], mesh):
    """PST opening with sharded MSMs for the large levels.

    Levels with >= 128 points per device run the point-range-sharded MSM;
    the small tail levels are fused into one local composite MSM
    (ops/msm.msm_many). Identical results to scheme.open_poly.
    """
    nv = pp.nv
    d = _mesh_size(mesh)
    if pp.powers_of_h_comb is None:
        raise invalid_arg("sharded open requires combined opening bases")
    point_mont = fo.encode_mont(FR, point)
    with span("open quotients + eval (sharded)"):
        qcat, ev_limbs = scheme._quotients_and_eval(poly, point_mont)

    device_results = [None] * nv
    msm_sh = sharded.make_sharded_msm(mesh, "fp2")
    small_idx, small_scal, small_bases, small_sizes = [], [], [], []
    off = 0
    with span("open G2 MSMs (sharded)"):
        for i in range(nv):
            m = 1 << (nv - 1 - i)
            q = qcat[:, off : off + m]
            off += m
            bases = pp.powers_of_h_comb[i]
            if m >= 128 * d:
                device_results[i] = msm_sh(
                    sharded.shard_points(mesh, bases),
                    sharded.shard_table(mesh, q),
                )
            else:
                small_idx.append(i)
                small_scal.append(q)
                small_bases.append(bases)
                small_sizes.append(m)
        if small_idx:
            # same banding (and therefore the same compiled msm_many
            # programs) as the single-device open — scheme.banded_g2_msms
            small_res = scheme.banded_g2_msms(
                small_bases, small_scal, small_sizes
            )
            for j, i in enumerate(small_idx):
                device_results[i] = small_res[j]
        proofs = cv.g2_decode_many(device_results)

    eval_res = fo.decode_ints(FR, ev_limbs)[0]
    return eval_res, OpenProof(h=pp.h, proofs=proofs)


def prove(pk: IndexPK, v: List[int], w: List[int], pp: PublicParameter, mesh) -> Proof:
    """Sharded non-interactive prove; proof bytes identical to the
    single-device path (argument.MLArgumentForR1CS.prove)."""
    log_n = pk.log_n
    n = 1 << log_n
    d = _mesh_size(mesh)
    if n % d:
        raise invalid_arg("mesh size must divide the instance size")

    fs = Blake2sRng.setup()
    fs.feed(pk.matrix_a.serialize())
    fs.feed(pk.matrix_b.serialize())
    fs.feed(pk.matrix_c.serialize())
    fs.feed(ser.ser_fr_vec(v))
    log_v = len(v).bit_length() - 1

    ps = pr.prover_init(pk, v, w)
    z = fo.encode_mont(FR, ps.v + ps.w)

    with span("Prove 1 (sharded)"):
        com = sharded_commit(pp, z, mesh)
    pm1 = pr.ProverFirstMessage(commitment=com)
    fs.feed(pm1.serialize())
    r_v = fs.sample_fr_vec(log_v)

    with span("Prove 2 (sharded)"):
        point = list(r_v) + [0] * (log_n - log_v)
        z_rv_0, proof2 = sharded_open(pp, z, point, mesh)
    pm2 = pr.ProverSecondMessage(z_rv_0=z_rv_0, proof_for_z_rv_0=proof2)
    fs.feed(pm2.serialize())
    tor = fs.sample_fr_vec(log_n)

    with span("Prove 3 (sharded)"):
        az, bz, cz, suffix = pr._third_round_fused(
            pk.matrix_a.coo, pk.matrix_b.coo, pk.matrix_c.coo, z,
            fo.encode_mont(FR, tor),
        )
        suffix = list(suffix)
    pm3 = pr.ProverThirdMessage(
        ml_index_info=sc.IndexInfo(max_multiplicands=log_n + 2, num_variables=log_n)
    )
    fs.feed(pm3.serialize())

    # ---- sumcheck 1 (sharded rounds while >= 1 entry/device post-fold) ----
    rnd_first = sharded.make_sharded_sc1_round(mesh, do_fold=False)
    rnd_fold = sharded.make_sharded_sc1_round(mesh, do_fold=True)
    az_s = sharded.shard_table(mesh, az)
    bz_s = sharded.shard_table(mesh, bz)
    cz_s = sharded.shard_table(mesh, cz)
    inv2 = hf.fr_inv(2)
    pre = 1
    randomness: List[int] = []
    sc1_msgs = []
    r_host = None
    sharded_mode = True
    with span("Prove Sumcheck 1 (sharded)"):
        for i in range(log_n):
            if sharded_mode and (n >> (i + 1)) < d:
                az_s = jnp.asarray(jax.device_get(az_s))
                bz_s = jnp.asarray(jax.device_get(bz_s))
                cz_s = jnp.asarray(jax.device_get(cz_s))
                sharded_mode = False
            if i > 0:
                pre = pre * pr.ell(tor[i - 1], r_host) % hf.R
                randomness.append(r_host)
                r_dev = fo.encode_mont(FR, [r_host])
            else:
                r_dev = fo.encode_mont(FR, [0])
            if sharded_mode:
                s = sharded.shard_table(mesh, suffix[i + 1])
                fn = rnd_first if i == 0 else rnd_fold
                q, az_s, bz_s, cz_s = fn(az_s, bz_s, cz_s, s, r_dev)
            else:
                q, az_s, bz_s, cz_s = sck.sc1_round(
                    az_s, bz_s, cz_s, suffix[i + 1], i > 0, r_dev
                )
            q0, q1, q2 = fo.decode_mont(FR, q)

            def q_at(t: int) -> int:
                return (
                    q0 * ((t - 1) * (t - 2) % hf.R) % hf.R * inv2
                    - q1 * (t * (t - 2) % hf.R)
                    + q2 * (t * (t - 1) % hf.R) % hf.R * inv2
                ) % hf.R

            deg = log_n + 2
            evals = [
                pre * pr.ell(tor[i], t) % hf.R * q_at(t) % hf.R
                for t in range(deg + 1)
            ]
            pm = sc.ProverMsg(evaluations=evals)
            fs.feed(pm.serialize())
            sc1_msgs.append(pm)
            if i < log_n - 1:
                r_host = vr.sample_verify_first_sumcheck_ongoing_round(fs).randomness
        vm3 = vr.sample_verify_first_sumcheck_final_round(fs)
        last1 = vm3.last_random_point

    # ---- round 4 ----
    if sharded_mode:
        az_s = jnp.asarray(jax.device_get(az_s))
        bz_s = jnp.asarray(jax.device_get(bz_s))
        cz_s = jnp.asarray(jax.device_get(cz_s))
    r_dev = fo.encode_mont(FR, [last1])
    abz = jnp.concatenate([az_s, bz_s, cz_s], axis=1)
    va, vb, vc = fo.decode_mont(FR, mle.fold(abz, r_dev))  # one fetch
    r_x = randomness + [last1]
    pm4 = pr.ProverFourthMessage(va=va, vb=vb, vc=vc)
    fs.feed(pm4.serialize())
    vm4 = vr.sample_verify_fourth_round(fs)

    # ---- round 5 (local sparse partial-eval) ----
    with span("Prove 5 (sharded)"):
        w_tab = pr._fifth_round_fused(
            pk.matrix_a.coo, pk.matrix_b.coo, pk.matrix_c.coo,
            fo.encode_mont(FR, r_x),
            fo.encode_mont(FR, [vm4.r_a, vm4.r_b, vm4.r_c]),
        )
    pm5 = pr.ProverFifthMessage(
        index_info=sc.IndexInfo(max_multiplicands=2, num_variables=log_n)
    )
    fs.feed(pm5.serialize())

    # ---- sumcheck 2 (sharded rounds) ----
    p2_first = sharded.make_sharded_prod2_round(mesh, do_fold=False)
    p2_fold = sharded.make_sharded_prod2_round(mesh, do_fold=True)
    w_s = sharded.shard_table(mesh, w_tab)
    z_s = sharded.shard_table(mesh, z)
    sc2_msgs = []
    randomness2: List[int] = []
    r_host = None
    sharded_mode = True
    with span("Prove Sumcheck 2 (sharded)"):
        for i in range(log_n):
            if sharded_mode and (n >> (i + 1)) < d:
                w_s = jnp.asarray(jax.device_get(w_s))
                z_s = jnp.asarray(jax.device_get(z_s))
                sharded_mode = False
            if i > 0:
                randomness2.append(r_host)
                r_dev = fo.encode_mont(FR, [r_host])
            else:
                r_dev = fo.encode_mont(FR, [0])
            if sharded_mode:
                fn = p2_first if i == 0 else p2_fold
                q, w_s, z_s = fn(w_s, z_s, r_dev)
            else:
                q, w_s, z_s = sck.prod2_round(w_s, z_s, i > 0, r_dev)
            pm = sc.ProverMsg(evaluations=fo.decode_mont(FR, q))
            fs.feed(pm.serialize())
            sc2_msgs.append(pm)
            if i < log_n - 1:
                r_host = vr.sample_verify_second_sumcheck_ongoing_round(fs).randomness
        vm5 = vr.sample_verify_second_sumcheck_final_round(fs)
        last2 = vm5.last_random_point

    # ---- round 6 ----
    with span("Prove 6 (sharded)"):
        r_y = randomness2 + [last2]
        z_ry, proof6 = sharded_open(pp, z, r_y, mesh)
    pm6 = pr.ProverSixthMessage(z_ry=z_ry, proof_for_z_ry=proof6)

    return Proof(
        prover_first_message=pm1,
        prover_second_message=pm2,
        prover_third_message=pm3,
        first_sumcheck_messages=sc1_msgs,
        prover_fourth_message=pm4,
        prover_fifth_message=pm5,
        second_sumcheck_messages=sc2_msgs,
        prover_sixth_message=pm6,
    )
