"""Sweep SPARTAN_PALLAS_UNROLL / curve-block knobs: field mul + opening MSM.

Timing method: jax.block_until_ready is a NO-OP under the axon tunnel
runtime (measured: 0.02 ms for a 2^20-lane kernel that takes ~7 ms; a
device_get of a 1-lane slice of the result is the only reliable completion
fence). Every timing here fetches a tiny slice of the result, so times
include one tunnel RTT — identical across settings, so deltas are real.

Each setting runs in a fresh subprocess (knobs are read at module import).

Usage: python scripts/sweep_kernel_knobs.py            # run the sweep
       python scripts/sweep_kernel_knobs.py child U CB # (internal)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(unroll: str, curve_block: str):
    os.environ["SPARTAN_PALLAS_UNROLL"] = unroll
    os.environ["SPARTAN_PALLAS_CURVE_BLOCK"] = curve_block
    import random

    import jax
    import jax.numpy as jnp

    from spartan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)

    from spartan_tpu.host import field as hf
    from spartan_tpu.ops import field as fo, msm as msm_mod
    from spartan_tpu.ops.field import FP, FR

    def fetch(tree):
        """Force completion: device_get a one-lane slice of every leaf."""
        return jax.device_get(
            jax.tree_util.tree_map(lambda v: v[..., :1], tree)
        )

    def bench(fn, *args, reps=5, warm=2):
        for _ in range(warm):
            fetch(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rng = random.Random(0)
    out = {"unroll": unroll, "curve_block": curve_block}

    # RTT floor (tiny program + fetch), subtracted from nothing — reported
    tiny = jnp.zeros((16, 128), jnp.uint32)
    out["rtt_ms"] = round(bench(lambda x: x + 1, tiny) * 1e3, 1)

    n = 1 << 20
    a = fo.encode_mont(FR, [rng.randrange(hf.R) for _ in range(1024)])
    a = jnp.tile(a, (1, n // 1024))
    t = bench(lambda x: fo.mont_mul(FR, x, x), a)
    out["fr_mul_ms"] = round(t * 1e3, 1)

    ap = fo.encode_mont(FP, [rng.randrange(hf.P) for _ in range(1024)])
    ap = jnp.tile(ap, (1, n // 1024))
    t = bench(lambda x: fo.mont_mul(FP, x, x), ap)
    out["fp_mul_ms"] = round(t * 1e3, 1)

    # open-shaped G2 msm_many at 2^14 (c=8 band only — the dominant program)
    from spartan_tpu.commitment import persist

    cache = "/root/.cache/spartan_bench_keys_14.npz"
    if os.path.exists(cache):
        pp, _vp = persist.load_keys(cache)
        sizes = tuple(1 << k for k in range(13, 8, -1))  # 8192..512
        blist = [pp.powers_of_h_comb[i] for i in range(5)]
        bases = jax.tree_util.tree_map(
            lambda *ls: jnp.concatenate(list(ls), axis=-1), *blist
        )
        tot = sum(sizes)
        scal = fo.encode_ints(FR, [rng.randrange(hf.R) for _ in range(1024)])
        scal = jnp.tile(scal, (1, (tot + 1023) // 1024))[:, :tot]
        t = bench(
            lambda b, s: msm_mod.msm_many(b, sizes, s, "fp2", 8), bases, scal,
            reps=3, warm=1,
        )
        out["g2_msm_many_s"] = round(t, 3)
    print("RESULT " + json.dumps(out), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], sys.argv[3])
        return
    settings = [("4", "512"), ("8", "512"), ("2", "512"),
                ("4", "1024"), ("4", "256"), ("8", "1024")]
    for u, cb in settings:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", u, cb],
            capture_output=True, text=True, timeout=2400,
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, f"(wall {time.time()-t0:.0f}s)", flush=True)
        if r.returncode != 0:
            print(f"# unroll={u} curve_block={cb} FAILED rc={r.returncode}",
                  r.stderr[-500:], flush=True)


if __name__ == "__main__":
    main()
