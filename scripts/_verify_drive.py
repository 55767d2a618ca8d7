"""End-to-end drive through the public API on the CPU backend (8 virtual
devices): setup -> index -> prove -> verify + serde + rejection probes.
Used by the /verify workflow; safe to run anywhere (forces cpu)."""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from spartan_tpu.utils.cache import setup_compile_cache

setup_compile_cache(jax, backend="cpu")

import random
import time

from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.protocol.proof import Proof
from spartan_tpu.utils.errors import SpartanError


def main():
    t0 = time.time()
    rng = random.Random(0)
    cs, v, w = generate_circuit_with_random_input(
        num_public=4, num_private=(1 << 8) - 4, pad_to_square=True,
        density=1, rng=rng,
    )
    A, B, C = cs.to_matrices()
    pp, vp = MLArgumentForR1CS.setup(8, rng)
    print("setup done", round(time.time() - t0, 1), "s", flush=True)
    pk = MLArgumentForR1CS.index(A, B, C)
    proof = MLArgumentForR1CS.prove(pk, v, w, pp)
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)
    print("prove+verify OK", round(time.time() - t0, 1), "s", flush=True)

    blob = proof.serialize()
    proof2 = Proof.deserialize(blob)
    assert MLArgumentForR1CS.verify(pk.vk(), v, proof2, vp)
    print("serde re-verify OK", len(blob), "bytes", flush=True)

    w_bad = list(w)
    w_bad[3] = (w_bad[3] + 1) % (2 ** 255)
    try:
        bad = MLArgumentForR1CS.prove(pk, v, w_bad, pp)
        ok = MLArgumentForR1CS.verify(pk.vk(), v, bad, vp)
        assert not ok, "bad witness accepted!"
        print("bad witness rejected (verify False)", flush=True)
    except SpartanError as e:
        print("bad witness rejected:", type(e).__name__, flush=True)

    try:
        v_bad = list(v)
        v_bad[1] = (v_bad[1] + 1) % (2 ** 255)
        ok = MLArgumentForR1CS.verify(pk.vk(), v_bad, proof, vp)
        assert not ok
        print("wrong public input rejected (False)", flush=True)
    except SpartanError as e:
        print("wrong public input rejected:", type(e).__name__, flush=True)
    print("VERIFY DRIVE OK", round(time.time() - t0, 1), "s", flush=True)


if __name__ == "__main__":
    main()
