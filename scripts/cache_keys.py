"""Pre-cache setup keys for every bench ladder size.

Mirrors the reference's ``setup_bench`` (src/commitment/mod.rs:42-55), which
serializes keys to the ``benchmark_cached_keys`` file so the timing benches
never pay keygen. Run this after any cache wipe so bench.py / bench_pc.py /
scripts/measure_e2e.py find warm keys on disk.

Usage: python scripts/cache_keys.py [sizes]   (default "6,12,14,16")
Sizes run ascending in ONE process so keygen programs are shared.
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
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.commitment import persist


class _Rng:
    def __init__(self, seed):
        self._r = random.Random(seed)

    def sample_fr(self):
        return self._r.randrange(hf.R)


def main():
    sizes = [int(s) for s in
             (sys.argv[1] if len(sys.argv) > 1 else "6,12,14,16").split(",")]
    for log_n in sorted(sizes):
        cache = f"/root/.cache/spartan_bench_keys_{log_n}.npz"
        if os.path.exists(cache):
            print(f"logn={log_n}: cached already", flush=True)
            continue
        t0 = time.perf_counter()
        # seed 42 matches bench.py's keygen seed so caches are interchangeable
        pp, vp = MLArgumentForR1CS.setup(log_n, _Rng(42))
        keygen_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        persist.save_keys(cache, pp, vp)
        print(f"logn={log_n}: keygen={keygen_s:.1f}s "
              f"save={time.perf_counter()-t0:.1f}s -> {cache}", flush=True)
        del pp, vp


if __name__ == "__main__":
    main()
