"""In-round measurement: warm prove/verify span breakdown at one size.

Usage: python scripts/measure_e2e.py [log_n] (default 14). Uses cached keys.
Prints cold + warm prove and verify with span trees for the warm passes.
"""

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

from spartan_tpu.utils.cache import setup_compile_cache

setup_compile_cache(jax)

from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.commitment import persist
from spartan_tpu.utils import timers


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    log_v = 2
    rng = random.Random(0)
    num_public = 1 << log_v
    num_private = (1 << log_n) - num_public
    cs, v, w = generate_circuit_with_random_input(
        num_public=num_public, num_private=num_private,
        pad_to_square=True, density=0, rng=rng,
    )
    a, b, c = cs.to_matrices()

    cache = f"/root/.cache/spartan_bench_keys_{log_n}.npz"
    t0 = time.perf_counter()
    pp, vp = persist.load_keys(cache)
    print(f"load keys: {time.perf_counter()-t0:.2f}s", flush=True)

    pk = MLArgumentForR1CS.index(a, b, c)

    t0 = time.perf_counter()
    proof = MLArgumentForR1CS.prove(pk, v, w, pp)
    print(f"cold prove: {time.perf_counter()-t0:.2f}s", flush=True)

    timers.set_print_trace(True)
    t0 = time.perf_counter()
    proof = MLArgumentForR1CS.prove(pk, v, w, pp)
    warm = time.perf_counter() - t0
    timers.set_print_trace(False)
    print(f"warm prove: {warm:.2f}s", flush=True)

    t0 = time.perf_counter()
    ok = MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)
    print(f"cold verify: {time.perf_counter()-t0:.2f}s ok={ok}", flush=True)

    timers.set_print_trace(True)
    t0 = time.perf_counter()
    ok = MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)
    warmv = time.perf_counter() - t0
    timers.set_print_trace(False)
    print(f"warm verify: {warmv:.2f}s ok={ok}", flush=True)


if __name__ == "__main__":
    main()
