"""Non-interactive argument driver (L5) — reference src/lib.rs.

``MLArgumentForR1CS.{setup, index, prove, verify}``: seeds the Fiat–Shamir
RNG with the serialized A, B, C matrices and the public input (lib.rs:61-65),
alternates prover rounds with transcript-derived verifier messages
(re-feeding every prover message, lib.rs:74-134), and assembles/consumes the
Proof container. The verifier replays the identical transcript (lib.rs:147+).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax

from spartan_tpu.commitment import PublicParameter, VerifierParameter, keygen
from spartan_tpu.models.r1cs import Matrix
from spartan_tpu.ops import field as fo
from spartan_tpu.ops.field import FR
from spartan_tpu.protocol import prover as pr
from spartan_tpu.protocol import sumcheck as sc
from spartan_tpu.protocol import verifier as vr
from spartan_tpu.protocol.indexer import IndexPK, IndexVK, index as _index
from spartan_tpu.protocol.proof import Proof
from spartan_tpu.utils import serialize as ser
from spartan_tpu.utils.errors import invalid_arg
from spartan_tpu.utils.timers import span
from spartan_tpu.utils.transcript import Blake2sRng


def _use_device_fs() -> bool:
    """Device-resident transcript (protocol/fused.py): each sumcheck phase is
    one dispatch instead of one host round-trip per round. SPARTAN_DEVICE_FS=0
    falls back to the per-round host loop (identical bytes either way)."""
    return os.environ.get("SPARTAN_DEVICE_FS", "1") not in ("0", "false")


class MLArgumentForR1CS:
    """Non-interactive Spartan argument for R1CS over BLS12-381."""

    # -- setup / index -----------------------------------------------------
    @staticmethod
    def setup(nv: int, rng) -> Tuple[PublicParameter, VerifierParameter]:
        """Trusted setup; discards the trapdoor (reference ahp/setup.rs:13-16).

        rng: anything with sample_fr() (e.g. utils.transcript.Blake2sRng) or a
        stdlib random.Random-like object with randrange().
        """
        if not hasattr(rng, "sample_fr") and hasattr(rng, "randrange"):
            from spartan_tpu.host import field as _hf

            class _Adapter:
                def __init__(self, r):
                    self._r = r

                def sample_fr(self):
                    return self._r.randrange(_hf.R)

            rng = _Adapter(rng)
        pp, vp, _t = keygen(nv, rng)
        return pp, vp

    @staticmethod
    def index(matrix_a: Matrix, matrix_b: Matrix, matrix_c: Matrix) -> IndexPK:
        return _index(matrix_a, matrix_b, matrix_c)

    # -- prove -------------------------------------------------------------
    @staticmethod
    def prove(
        pk: IndexPK, v: List[int], w: List[int], pp: PublicParameter, mesh=None
    ) -> Proof:
        """Non-interactive prove. With ``mesh`` (a jax.sharding.Mesh), the
        commit/opening MSMs and both sumchecks run sharded over the mesh
        (parallel/sharded_prove.py) — same proof bytes at any device count."""
        if mesh is not None:
            from spartan_tpu.parallel import sharded_prove

            return sharded_prove.prove(pk, v, w, pp, mesh)
        log_n = pk.log_n
        fs = Blake2sRng.setup()
        fs.feed(pk.matrix_a.serialize())
        fs.feed(pk.matrix_b.serialize())
        fs.feed(pk.matrix_c.serialize())
        fs.feed(ser.ser_fr_vec(v))
        log_v = len(v).bit_length() - 1

        ps = pr.prover_init(pk, v, w)

        with span("Prove 1"):
            ps, pm1 = pr.prover_first_round(ps, pp)
        fs.feed(pm1.serialize())
        r_v = fs.sample_fr_vec(log_v)

        with span("Prove 2"):
            ps, pm2 = pr.prover_second_round(ps, r_v, pp)
        fs.feed(pm2.serialize())
        tor = fs.sample_fr_vec(log_n)

        with span("Prove 3"):
            ps, pm3 = pr.prover_third_round(ps, tor)
        fs.feed(pm3.serialize())

        if _use_device_fs():
            from spartan_tpu.ops import fs_device as fsd
            from spartan_tpu.protocol import fused

            with span("Prove Sumcheck 1 (fused)"):
                ev1, rs1, vabc, rabc, st = fused.sc1_phase(
                    ps.az, ps.bz, ps.cz, tuple(ps.suffix),
                    fo.encode_mont(FR, tor), fsd.state_to_words(fs.get_state()),
                )
                ev1, rs1, vabc, rabc, st = jax.device_get(
                    (ev1, rs1, vabc, rabc, st)
                )
            sc1_msgs = [
                sc.ProverMsg(evaluations=FR.dec(ev1[i])) for i in range(log_n)
            ]
            rs1_i = FR.dec(rs1)
            va, vb, vc = FR.dec(vabc)
            r_a, r_b, r_c = FR.dec(rabc)
            fs.set_state(fsd.words_to_state(st))
            pm4 = pr.ProverFourthMessage(va=va, vb=vb, vc=vc)
            ps = pr.ProverFifthState(pk=pk, z=ps.z, r_x=rs1_i)
        else:
            with span("Prove Sumcheck 1"):
                sc1_msgs = []
                v_msg = None
                for _ in range(log_n - 1):
                    ps, pm = pr.prove_first_sumcheck_round(ps, v_msg)
                    fs.feed(pm.serialize())
                    sc1_msgs.append(pm)
                    v_msg = vr.sample_verify_first_sumcheck_ongoing_round(fs)
                ps, pm = pr.prove_first_sumcheck_round(ps, v_msg)
            fs.feed(pm.serialize())
            sc1_msgs.append(pm)
            vm3 = vr.sample_verify_first_sumcheck_final_round(fs)

            with span("Prove 4"):
                ps, pm4 = pr.prove_fourth_round(ps, vm3.last_random_point)
            fs.feed(pm4.serialize())
            vm4 = vr.sample_verify_fourth_round(fs)
            r_a, r_b, r_c = vm4.r_a, vm4.r_b, vm4.r_c

        with span("Prove 5"):
            ps, pm5 = pr.prove_fifth_round(ps, r_a, r_b, r_c)
        fs.feed(pm5.serialize())

        if _use_device_fs():
            from spartan_tpu.ops import fs_device as fsd
            from spartan_tpu.protocol import fused

            with span("Prove Sumcheck 2 (fused)"):
                ev2, rs2, st = fused.sc2_phase(
                    ps.w_cur, ps.z_cur, fsd.state_to_words(fs.get_state())
                )
                ev2, rs2, st = jax.device_get((ev2, rs2, st))
            sc2_msgs = [
                sc.ProverMsg(evaluations=FR.dec(ev2[i])) for i in range(log_n)
            ]
            rs2_i = FR.dec(rs2)
            fs.set_state(fsd.words_to_state(st))
            ps.randomness = rs2_i[:-1]
            last2 = rs2_i[-1]
        else:
            with span("Prove Sumcheck 2"):
                sc2_msgs = []
                v_msg = None
                for _ in range(log_n - 1):
                    ps, pm = pr.prove_second_sumcheck_round(ps, v_msg)
                    fs.feed(pm.serialize())
                    sc2_msgs.append(pm)
                    v_msg = vr.sample_verify_second_sumcheck_ongoing_round(fs)
                ps, pm = pr.prove_second_sumcheck_round(ps, v_msg)
            fs.feed(pm.serialize())
            sc2_msgs.append(pm)
            vm5 = vr.sample_verify_second_sumcheck_final_round(fs)
            last2 = vm5.last_random_point

        with span("Prove 6"):
            pm6 = pr.prove_sixth_round(ps, last2, pp)

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

    # -- verify ------------------------------------------------------------
    @staticmethod
    def verify(vk: IndexVK, v: List[int], proof: Proof, vp: VerifierParameter) -> bool:
        log_n = vk.log_n
        sc1 = list(proof.first_sumcheck_messages)
        sc2 = list(proof.second_sumcheck_messages)
        if len(sc1) != log_n or len(sc2) != log_n:
            raise invalid_arg("malformed sumcheck message")

        fs = Blake2sRng.setup()
        fs.feed(vk.matrix_a.serialize())
        fs.feed(vk.matrix_b.serialize())
        fs.feed(vk.matrix_c.serialize())
        fs.feed(ser.ser_fr_vec(v))

        vs = vr.verifier_init(vk, v)

        fs.feed(proof.prover_first_message.serialize())
        vs, _ = vr.verify_first_round(vs, proof.prover_first_message, fs)

        fs.feed(proof.prover_second_message.serialize())
        vs, _ = vr.verify_second_round(vs, proof.prover_second_message, fs)

        fs.feed(proof.prover_third_message.serialize())
        vs, _ = vr.verify_third_round(vs, proof.prover_third_message)

        for i in range(log_n - 1):
            fs.feed(sc1[i].serialize())
            vs, _ = vr.verify_first_sumcheck_ongoing_round(vs, sc1[i], fs)
        fs.feed(sc1[log_n - 1].serialize())
        vs, _ = vr.verify_first_sumcheck_final_round(vs, sc1[log_n - 1], fs)

        fs.feed(proof.prover_fourth_message.serialize())
        vs, _ = vr.verify_fourth_round(vs, proof.prover_fourth_message, fs)

        fs.feed(proof.prover_fifth_message.serialize())
        vs, _ = vr.verify_fifth_round(vs, proof.prover_fifth_message)

        for i in range(log_n - 1):
            fs.feed(sc2[i].serialize())
            vs, _ = vr.verify_second_sumcheck_ongoing_round(vs, sc2[i], fs)
        fs.feed(sc2[log_n - 1].serialize())
        vs, _ = vr.verify_second_sumcheck_final_round(vs, sc2[log_n - 1], fs)

        fs.feed(proof.prover_sixth_message.serialize())
        with span("Verify 6"):
            return vr.verify_sixth_round(vs, proof.prover_sixth_message, vp)
