"""Round-5 on-chip profiling: where does warm prove time actually go?

Measures, in ONE process at a given size (default 2^14):
  - tunnel dispatch/fetch RTT (tiny device_get x10)
  - kernel primitive rates: Fr/Fp mont_mul, G1/G2 add at MSM-like widths
  - MSM stage split: digits+sort / +bucket walk / +reduce+horner (probe jits)
  - scheme-level spans of a warm prove + verify (timers trace)

Usage: python scripts/profile_round5.py [log_n]
"""

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from spartan_tpu.utils.cache import setup_compile_cache

setup_compile_cache(jax)

from functools import partial

import numpy as np

from spartan_tpu.host import field as hf
from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.commitment import persist
from spartan_tpu.ops import curve as cv, field as fo, msm as msm_mod
from spartan_tpu.ops.field import FP, FR
from spartan_tpu.utils import timers


def bench(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << log_n
    rng = random.Random(0)

    # --- RTT
    x = jnp.zeros((4,), jnp.uint32)
    jax.block_until_ready(x + 1)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(x + 1)
    rtt = (time.perf_counter() - t0) / 10
    print(f"RTT (dispatch tiny + fetch): {rtt*1e3:.1f} ms", flush=True)

    # --- primitive rates
    w = 1 << 17
    fr_a = jnp.asarray(np.random.randint(0, 1 << 15, (16, w), dtype=np.uint32))
    fr_b = jnp.asarray(np.random.randint(0, 1 << 15, (16, w), dtype=np.uint32))
    mm = jax.jit(lambda a, b: fo.mont_mul(FR, a, b))
    t = bench(mm, fr_a, fr_b)
    print(f"Fr mont_mul: {w/t/1e6:.0f} M/s  ({t*1e3:.2f} ms @ {w} lanes)", flush=True)

    fp_a = jnp.asarray(np.random.randint(0, 1 << 15, (24, w), dtype=np.uint32))
    fp_b = jnp.asarray(np.random.randint(0, 1 << 15, (24, w), dtype=np.uint32))
    mmp = jax.jit(lambda a, b: fo.mont_mul(FP, a, b))
    t = bench(mmp, fp_a, fp_b)
    print(f"Fp mont_mul: {w/t/1e6:.0f} M/s  ({t*1e3:.2f} ms @ {w} lanes)", flush=True)

    for wa in (1 << 12, 1 << 15):
        pts_raw = [hf.G1_GEN] * wa
        g1 = cv.g1_encode(pts_raw)
        add1 = jax.jit(lambda p: cv.add(cv.G1_FIELD, p, p))
        t = bench(add1, g1)
        print(f"G1 add (w={wa}): {wa/t/1e6:.2f} M/s ({t*1e3:.2f} ms)", flush=True)
        addm = jax.jit(lambda p: cv.add_mixed(cv.G1_FIELD, p, p))
        t = bench(addm, g1)
        print(f"G1 add_mixed (w={wa}): {wa/t/1e6:.2f} M/s ({t*1e3:.2f} ms)", flush=True)
    for wa in (1 << 12, 1 << 15):
        q = [hf.G2_GEN] * wa
        g2 = cv.g2_encode(q)
        add2 = jax.jit(lambda p: cv.add(cv.G2_FIELD, p, p))
        t = bench(add2, g2)
        print(f"G2 add (w={wa}): {wa/t/1e6:.2f} M/s ({t*1e3:.2f} ms)", flush=True)
        addm2 = jax.jit(lambda p: cv.add_mixed(cv.G2_FIELD, p, p))
        t = bench(addm2, g2)
        print(f"G2 add_mixed (w={wa}): {wa/t/1e6:.2f} M/s ({t*1e3:.2f} ms)", flush=True)

    # --- MSM stage probes (G1 commit-shaped: n points, c=8)
    scalars = jnp.asarray(
        np.random.randint(0, 1 << 16, (16, n), dtype=np.uint32)
    )
    pts = cv.g1_encode([hf.G1_GEN] * n)

    @partial(jax.jit, static_argnums=())
    def stage_sort(points, scalars):
        buckets_d, negs = msm_mod.signed_digits(scalars, 8)
        nw = buckets_d.shape[0]
        stride = 129
        key = (
            jnp.arange(nw, dtype=jnp.int32)[:, None] * stride + buckets_d
        ).reshape(-1)
        order = jnp.argsort(key)
        ks = jnp.take(key, order)
        ps = jax.tree_util.tree_map(
            lambda a: jnp.take(a, order % n, axis=-1), points
        )
        return ks, ps.x

    t = bench(stage_sort, pts, scalars)
    print(f"MSM stage digits+sort+take (G1 n={n}): {t*1e3:.1f} ms", flush=True)

    full = jax.jit(lambda p, s: msm_mod.msm(p, s, "fp", 8))
    t_full = bench(full, pts, scalars)
    print(f"MSM full (G1 n={n}): {t_full*1e3:.1f} ms", flush=True)

    # G2 open-shaped msm_many: comb levels n/2, n/4, ..., 1
    sizes = tuple((1 << (log_n - 1 - i)) for i in range(log_n))
    tot = sum(sizes)
    g2pts = cv.g2_encode([hf.G2_GEN] * tot)
    s2 = jnp.asarray(np.random.randint(0, 1 << 16, (16, tot), dtype=np.uint32))
    many = jax.jit(
        lambda p, s: msm_mod.msm_many(p, sizes, s, "fp2", 8)
    )
    t_many = bench(many, g2pts, s2)
    print(f"msm_many (G2 open-shaped, tot={tot}): {t_many*1e3:.1f} ms", flush=True)

    # --- full prove/verify with spans
    log_v = 2
    cs, v, w_wit = generate_circuit_with_random_input(
        num_public=1 << log_v, num_private=n - (1 << log_v),
        pad_to_square=True, density=0, rng=rng,
    )
    a, b, c = cs.to_matrices()
    cache = f"/root/.cache/spartan_bench_keys_{log_n}.npz"
    pp, vp = persist.load_keys(cache)
    pk = MLArgumentForR1CS.index(a, b, c)

    t0 = time.perf_counter()
    proof = MLArgumentForR1CS.prove(pk, v, w_wit, pp)
    print(f"cold prove: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    proof = MLArgumentForR1CS.prove(pk, v, w_wit, pp)
    print(f"warm prove 2: {time.perf_counter()-t0:.2f}s", flush=True)

    timers.set_print_trace(True)
    t0 = time.perf_counter()
    proof = MLArgumentForR1CS.prove(pk, v, w_wit, pp)
    print(f"warm prove (traced): {time.perf_counter()-t0:.2f}s", flush=True)
    vk = pk.vk()
    ok = MLArgumentForR1CS.verify(vk, v, proof, vp)
    t0 = time.perf_counter()
    ok = MLArgumentForR1CS.verify(vk, v, proof, vp)
    print(f"warm verify: {time.perf_counter()-t0:.2f}s ok={ok}", flush=True)


if __name__ == "__main__":
    main()
