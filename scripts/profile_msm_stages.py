"""Split msm_many (G2, open-shaped) and msm (G1, commit-shaped) into stages
and time each on the chip, plus in-program field-mul rates.

Usage: python scripts/profile_msm_stages.py [log_n]
"""

import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.utils.cache import setup_compile_cache

setup_compile_cache(jax)

from spartan_tpu.host import field as hf
from spartan_tpu.ops import curve as cv, field as fo, msm as mm
from spartan_tpu.ops.field import FP, FR


def _force(out):
    """Force completion with a host fetch (block_until_ready is unreliable
    on the experimental axon backend — round-4 PERF.md note)."""
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        np.asarray(leaf[(0,) * leaf.ndim])  # tiny fetch, waits on the buffer


def bench(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def staged_msm_many(points, sizes, scalars, fname, c, stage, s_sub_cap=32):
    """Replicates ops/msm.msm_many with a stage cutoff:
    1=digits+sort+take, 2=+bucket walk, 3=+weighted reduce, 4=full."""
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD
    sizes = tuple(int(s) for s in sizes)
    n = sum(sizes)
    L = len(sizes)
    buckets_d, negs = mm.signed_digits(scalars, c)
    nw = buckets_d.shape[0]
    half = 1 << (c - 1)
    stride = half + 1

    def _zeros_sized(size):
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[:-1] + (size,), a.dtype) + a[..., :1] * 0,
            points,
        )

    pid = np.repeat(np.arange(L, dtype=np.int32), np.asarray(sizes))
    w_ids = jnp.arange(nw, dtype=jnp.int32)[:, None]
    key = ((jnp.asarray(pid)[None, :] * nw + w_ids) * stride + buckets_d).reshape(-1)
    order = jnp.argsort(key)
    ks = jnp.take(key, order)
    ps = mm._tree_take(points, order % n)
    ps = mm._neg_y_where(f, jnp.take(negs.reshape(-1), order), ps)
    if stage == 1:
        return ks, ps.x

    glen_1 = nw * stride

    def band(sz):
        return max(0, (sz // stride)).bit_length() // 2

    groups = []
    for l, sz in enumerate(sizes):
        if groups and band(sz) == band(sizes[groups[-1][0]]):
            groups[-1] = (groups[-1][0], groups[-1][1] + 1)
        else:
            groups.append((l, 1))

    per_group = []
    off = 0
    for l0, cnt in groups:
        t_g = nw * sum(sizes[l0 : l0 + cnt])
        glen_g = cnt * glen_1
        ks_g = ks[off : off + t_g] - jnp.int32(l0 * glen_1)
        ps_g = jax.tree_util.tree_map(lambda a: a[..., off : off + t_g], ps)
        prev = jnp.concatenate([ks_g[:1] - 1, ks_g[:-1]])
        per_group.append(
            mm._bucket_accumulate(
                f, ps_g, ks_g, ks_g != prev, glen_g,
                _zeros_sized(t_g), _zeros_sized(glen_g), t_g,
            )
        )
        off += t_g
    buckets = jax.tree_util.tree_map(
        lambda *ls: jnp.concatenate(list(ls), axis=-1), *per_group
    )
    if stage == 2:
        return buckets.x

    buckets = mm._slice_windows(buckets, L * nw, stride, half)
    wsums = mm._weighted_reduce_tree(f, buckets, half)
    if stage == 3:
        return wsums.x
    wsums = jax.tree_util.tree_map(
        lambda a: a.reshape(a.shape[:-1] + (L, nw)), wsums
    )

    def window_step(result, w):
        result = jax.lax.fori_loop(0, c, lambda _, r: cv.double(f, r), result)
        col = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, w, axis=-1, keepdims=False),
            wsums,
        )
        return cv.add(f, result, col), None

    ws = jnp.arange(nw - 1, -1, -1, dtype=jnp.int32)
    result, _ = jax.lax.scan(window_step, _zeros_sized(L), ws)
    return result.x


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << log_n

    # in-program field rates: chain muls in one jit
    for name, spec, k in (("Fr", FR, 16), ("Fp", FP, 24)):
        w = 1 << 15
        a = jnp.asarray(np.random.randint(0, 1 << 15, (k, w), dtype=np.uint32))
        b = jnp.asarray(np.random.randint(0, 1 << 15, (k, w), dtype=np.uint32))

        @jax.jit
        def chain(a, b):
            def body(i, ab):
                a, b = ab
                return fo.mont_mul(spec, a, b), a
            return jax.lax.fori_loop(0, 64, body, (a, b))[0]

        t = bench(chain, a, b)
        print(f"{name} mont_mul in-program: {64*w/t/1e6:.0f} M/s "
              f"({t*1e3:.1f} ms / 64 chained @ {w} lanes)", flush=True)

    # G2 open-shaped msm_many stages
    sizes = tuple((1 << (log_n - 1 - i)) for i in range(log_n))
    tot = sum(sizes)
    g2pts = cv.g2_encode([hf.G2_GEN] * tot)
    s2 = jnp.asarray(np.random.randint(0, 1 << 16, (16, tot), dtype=np.uint32))
    prev = 0.0
    for stage in (1, 2, 3, 4):
        fn = jax.jit(partial(staged_msm_many, sizes=sizes, fname="fp2", c=8,
                             stage=stage))
        t = bench(lambda p, s: fn(p, scalars=s), g2pts, s2)
        print(f"G2 msm_many stage {stage}: {t*1e3:.1f} ms (delta "
              f"{(t-prev)*1e3:.1f} ms)", flush=True)
        prev = t

    # G1 commit-shaped msm stages (single problem)
    g1pts = cv.g1_encode([hf.G1_GEN] * n)
    s1 = jnp.asarray(np.random.randint(0, 1 << 16, (16, n), dtype=np.uint32))
    prev = 0.0
    for stage in (1, 2, 3, 4):
        fn = jax.jit(partial(staged_msm_many, sizes=(n,), fname="fp", c=8,
                             stage=stage))
        t = bench(lambda p, s: fn(p, scalars=s), g1pts, s1)
        print(f"G1 msm stage {stage}: {t*1e3:.1f} ms (delta "
              f"{(t-prev)*1e3:.1f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
