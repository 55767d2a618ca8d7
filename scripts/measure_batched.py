"""Batched-proving throughput on the TPU (BASELINE config 5 stepping stone).

Proves B instances of one 2^logn circuit via protocol.batched.prove_many
(shared (16, B, N) device dispatches) and via B sequential prove() calls,
reporting proofs/s for both. Usage:

  python scripts/measure_batched.py [log_n] [B]   (default 12 8)
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

from spartan_tpu.host import field as hf
from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.protocol.batched import prove_many
from spartan_tpu.commitment import persist


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    log_v = 2
    rng = random.Random(0)
    cs, v, w = generate_circuit_with_random_input(
        num_public=1 << log_v, num_private=(1 << log_n) - (1 << log_v),
        pad_to_square=True, density=0, rng=rng,
    )
    a, b, c = cs.to_matrices()
    pp, vp = persist.load_keys(f"/root/.cache/spartan_bench_keys_{log_n}.npz")
    pk = MLArgumentForR1CS.index(a, b, c)

    # distinct instances: vary free witness variables (no matrix references)
    used = set()
    for m in (a, b, c):
        for row in m:
            used.update(idx for _, idx in row)
    free = [i - len(v) for i in range(len(v), len(v) + len(w)) if i not in used]
    instances = []
    for k in range(bsz):
        wk = list(w)
        for j, fi in enumerate(free[: min(8, len(free))]):
            wk[fi] = (k * 131 + j * 17 + 5) % hf.R
        instances.append((v, wk))

    # warmup (compiles batched program family)
    t0 = time.perf_counter()
    proofs = prove_many(pk, instances, pp)
    print(f"prove_many warmup (B={bsz}): {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    proofs = prove_many(pk, instances, pp)
    batched_s = time.perf_counter() - t0

    # sequential baseline (warm up one prove first)
    MLArgumentForR1CS.prove(pk, *instances[0], pp)
    t0 = time.perf_counter()
    for vi, wi in instances:
        MLArgumentForR1CS.prove(pk, vi, wi, pp)
    seq_s = time.perf_counter() - t0

    ok = all(
        MLArgumentForR1CS.verify(pk.vk(), vi, p, vp)
        for (vi, _), p in zip(instances[:2], proofs[:2])
    )
    print(
        f"log_n={log_n} B={bsz}: batched {batched_s:.2f}s "
        f"({bsz / batched_s:.3f} proofs/s), sequential {seq_s:.2f}s "
        f"({bsz / seq_s:.3f} proofs/s), speedup {seq_s / batched_s:.2f}x, "
        f"verify_ok={ok}",
        flush=True,
    )


if __name__ == "__main__":
    main()
