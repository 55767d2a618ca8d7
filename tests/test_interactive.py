"""Interactive (non-FS) round-by-round protocol test + key persistence.

Mirrors reference src/ahp/tests.rs:8-70: drives the L4 prover/verifier state
machines directly with a real RNG instead of Fiat–Shamir, pairing each
prover_* with its verify_* — demonstrating L4 is usable without L5 and that
the two state machines stay in lock-step.
"""

import os
import random

from spartan_tpu.host import field as hf
from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol import prover as pr
from spartan_tpu.protocol import verifier as vr
from spartan_tpu.protocol.indexer import index
from spartan_tpu.commitment import keygen, persist


class _Rng:
    def __init__(self, seed=0):
        self._r = random.Random(seed)

    def sample_fr(self):
        return self._r.randrange(hf.R)

    def sample_fr_vec(self, n):
        return [self.sample_fr() for _ in range(n)]


def test_interactive_round_trip(tmp_path):
    log_n, log_v = 4, 2
    rng_circ = random.Random(0)
    cs, v, w = generate_circuit_with_random_input(
        num_public=1 << log_v,
        num_private=(1 << log_n) - (1 << log_v),
        pad_to_square=True,
        density=1,
        rng=rng_circ,
    )
    a, b, c = cs.to_matrices()
    pp, vp, _ = keygen(log_n, _Rng(5))

    # exercise key persistence on the way (reference: benchmark_cached_keys)
    cache = str(tmp_path / "keys.npz")
    persist.save_keys(cache, pp, vp)
    pp, vp = persist.load_keys(cache)

    pk = index(a, b, c)
    vk = pk.vk()
    rng = _Rng(7)

    ps = pr.prover_init(pk, v, w)
    vs = vr.verifier_init(vk, v)

    ps, pm = pr.prover_first_round(ps, pp)
    vs, vm = vr.verify_first_round(vs, pm, rng)

    ps, pm = pr.prover_second_round(ps, vm.r_v, pp)
    vs, vm = vr.verify_second_round(vs, pm, rng)

    ps, pm = pr.prover_third_round(ps, vm.tor)
    vs, vm = vr.verify_third_round(vs, pm)

    for _ in range(log_n - 1):
        ps, pm = pr.prove_first_sumcheck_round(ps, vm)
        vs, vm = vr.verify_first_sumcheck_ongoing_round(vs, pm, rng)

    ps, pm = pr.prove_first_sumcheck_round(ps, vm)
    vs, vm = vr.verify_first_sumcheck_final_round(vs, pm, rng)

    ps, pm = pr.prove_fourth_round(ps, vm.last_random_point)
    vs, vm = vr.verify_fourth_round(vs, pm, rng)

    ps, pm = pr.prove_fifth_round(ps, vm.r_a, vm.r_b, vm.r_c)
    vs, vm = vr.verify_fifth_round(vs, pm)

    for _ in range(log_n - 1):
        ps, pm = pr.prove_second_sumcheck_round(ps, vm)
        vs, vm = vr.verify_second_sumcheck_ongoing_round(vs, pm, rng)

    ps, pm = pr.prove_second_sumcheck_round(ps, vm)
    vs, vm = vr.verify_second_sumcheck_final_round(vs, pm, rng)

    pm = pr.prove_sixth_round(ps, vm.last_random_point, pp)
    assert vr.verify_sixth_round(vs, pm, vp)


def test_verifier_parameter_wire_roundtrip():
    pp, vp, _ = keygen(3, _Rng(9))
    data = persist.ser_verifier_parameter(vp)
    vp2 = persist.deser_verifier_parameter(data)
    assert vp2.nv == vp.nv and vp2.g == vp.g and vp2.h == vp.h
    assert vp2.g_mask_random == vp.g_mask_random
