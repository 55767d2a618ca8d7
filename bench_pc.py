"""Polynomial-commitment benchmark: keygen / commit / open / verify per nv.

Mirrors the reference's commitment benchmark pair (src/commitment/mod.rs:
41-84): ``setup_bench`` persists setup keys to a cache file so the
commit/open/verify timings exclude keygen; ``commit_open_verify_bench``
reloads and times each phase over an nv sweep.

Usage:
  python bench_pc.py setup   [nv_low nv_high]   # keygen + cache keys
  python bench_pc.py run     [nv_low nv_high]   # timed commit/open/verify
Cache file: benchmark_cached_keys_{nv}.npz (gitignored).
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from spartan_tpu.utils.cache import setup_compile_cache

setup_compile_cache(jax)

from spartan_tpu.host import field as hf
from spartan_tpu import commitment as pc
from spartan_tpu.commitment import persist
from spartan_tpu.ops import field as fo
from spartan_tpu.ops.field import FR


class _Rng:
    def __init__(self, seed):
        self._r = random.Random(seed)

    def sample_fr(self):
        return self._r.randrange(hf.R)


def _cache(nv):
    local = f"benchmark_cached_keys_{nv}.npz"
    if os.path.exists(local):
        return local
    # reuse the end-to-end bench's cached keys when present (same keygen)
    shared = f"/root/.cache/spartan_bench_keys_{nv}.npz"
    if os.path.exists(shared):
        return shared
    return local


def setup_bench(lo, hi):
    rng = _Rng(0)
    for nv in range(lo, hi + 1):
        t0 = time.perf_counter()
        pp, vp, _ = pc.keygen(nv, rng)
        print(f"setup nv={nv} (size={1 << nv}): {time.perf_counter() - t0:.2f}s")
        persist.save_keys(_cache(nv), pp, vp)


def run_bench(lo, hi):
    """Times are reported WARM (second call per phase; the first pays the
    one-time jit compiles, which the reference's Rust has no analog of)."""
    rng = random.Random(1)
    for nv in range(lo, hi + 1):
        pp, vp = persist.load_keys(_cache(nv))
        poly_ints = [rng.randrange(hf.R) for _ in range(1 << nv)]
        poly = fo.encode_mont(FR, poly_ints)
        point = [rng.randrange(hf.R) for _ in range(nv)]

        com = pc.commit(pp, poly)  # warmup (compiles)
        t0 = time.perf_counter()
        com = pc.commit(pp, poly)
        t_commit = time.perf_counter() - t0

        pc.open_poly(pp, poly, point)  # warmup
        t0 = time.perf_counter()
        ev, proof, _ = pc.open_poly(pp, poly, point)
        t_open = time.perf_counter() - t0

        ok = pc.verify(vp, com, point, ev, proof)  # host-side; warm == cold
        t0 = time.perf_counter()
        ok = pc.verify(vp, com, point, ev, proof)
        t_verify = time.perf_counter() - t0
        assert ok
        print(
            f"nv={nv} (size={1 << nv}): commit={t_commit:.3f}s "
            f"open={t_open:.3f}s verify={t_verify:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    if mode == "setup":
        setup_bench(lo, hi)
    else:
        run_bench(lo, hi)
