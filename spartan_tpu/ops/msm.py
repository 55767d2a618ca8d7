"""Multi-scalar multiplication kernels (variable-base Pippenger + fixed-base).

TPU-native equivalent of ``ark-ec``'s ``VariableBaseMSM::multi_scalar_mul``
(reference use: the commit MSM src/commitment/commit.rs:25, the opening MSMs
src/commitment/open.rs:49) and ``FixedBaseMSM`` (keygen
src/commitment/setup.rs:61-69, verifier src/commitment/verify.rs:21-24).

The reference runs a serial bucket-method Pippenger on one CPU core. The TPU
rebuild keeps Pippenger's window/bucket structure but replaces the serial
bucket scatter with a data-oblivious pipeline over ALL windows at once:

  1. SIGNED c-bit digit recoding from 16-bit scalar limbs (halves the
     bucket count; negative digits negate the affine base's y for free),
  2. one argsort of the composite key ``window * stride + bucket`` over the
     nw*N tiled lanes (XLA sort; window-major, bucket within window; zero
     digits land in a per-window sentinel bucket that is discarded),
  3. bucket accumulation: a strided sub-walker walk (~1 add per point) for
     dense levels or a Hillis-Steele segmented scan for sparse ones
     (_bucket_accumulate),
  4. pair-tree weighted bucket reduction (~3 * 2^(c-1) adds per window,
     _weighted_reduce_tree), then a Horner combine across windows.

Everything is one jitted program; infinity handling is Z=0 lane selects
throughout — no data-dependent control flow (the while_loops have
data-dependent trip counts but static shapes: adversarial scalars cost
time, never correctness).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.ops import curve as cv
from spartan_tpu.ops.curve import PointBatch

__all__ = ["msm", "fixed_base_msm", "digits_from_limbs", "signed_digits"]


def digits_from_limbs(scalars, c: int):
    """(16, N) canonical 16-bit limbs -> (nw, N) int32 c-bit digits, LSB window first.

    c must divide 16 (4, 8, or 16).
    """
    assert 16 % c == 0
    per_limb = 16 // c
    k, n = scalars.shape
    nw = k * per_limb
    digs = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(nw):
        limb = scalars[w // per_limb]
        sh = (w % per_limb) * c
        digs.append(((limb >> sh) & mask).astype(jnp.int32))
    return jnp.stack(digs)  # (nw, N)


def signed_digits(scalars, c: int):
    """Signed c-bit window recoding: (16, N) limbs -> (buckets, negs).

    Digits are recoded into [-H, H-1] with H = 2^(c-1) (carrying +1 into the
    next window on wrap), HALVING the bucket count vs unsigned digits — the
    point negation that pays for it is free for affine bases (negate y).

    buckets: (nw, N) int32 — |digit| - 1 in [0, H-1] for nonzero digits, or
    the sentinel H for zero digits (sentinel lanes land in a per-window
    discard bucket; the per-window layout stride is H + 1).
    negs: (nw, N) bool — digit < 0.

    The top window cannot wrap: canonical Fr scalars are < 2^255, so the top
    unsigned digit (+ carry) stays <= H.
    """
    digs = digits_from_limbs(scalars, c)  # (nw, N) in [0, 2^c)
    nw = digs.shape[0]
    half = 1 << (c - 1)
    buckets, negs = [], []
    carry = jnp.zeros_like(digs[0])
    for w in range(nw):
        t = digs[w] + carry
        if w == nw - 1:
            wrap = jnp.zeros_like(t, dtype=bool)
        else:
            wrap = t >= half
        s = jnp.where(wrap, t - (1 << c), t)  # signed digit in [-H, H-1]
        carry = wrap.astype(digs.dtype)
        mag = jnp.abs(s)
        buckets.append(jnp.where(mag > 0, mag - 1, half).astype(jnp.int32))
        negs.append(s < 0)
    return jnp.stack(buckets), jnp.stack(negs)


def _tree_take(p: PointBatch, idx) -> PointBatch:
    return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=-1), p)


# ---------------------------------------------------------------------------
# Small-n ladder MSM
# ---------------------------------------------------------------------------
#
# The Pippenger pipeline (sort + bucket walk + reduce tree) compiles into a
# large program whose build cost is shape-independent — at the tiny sizes the
# multichip dryrun and the CPU test suite use (2^4..2^6 points) that compile
# cost dwarfs the compute by orders of magnitude, and the broken XLA:CPU AOT
# persistent cache in the driver environment means it is paid per PROCESS.
# Below a threshold, a per-lane double-and-add ladder (one lax.scan over the
# 256 scalar bits: double + masked mixed add) + pair-tree reduction computes
# the same group elements with a program ~100x smaller. Identical results
# (exact group arithmetic; affine decode is representation-unique), so proof
# bytes are unchanged.

import os as _os

_LADDER_MAX = int(_os.environ.get("SPARTAN_MSM_LADDER_MAX", "64"))


def _bit_masks_msb(scalars):
    """(16, N) canonical limbs -> (256, N) bool bit masks, MSB first."""
    k, _n = scalars.shape
    rows = []
    for limb in range(k - 1, -1, -1):
        for b in range(15, -1, -1):
            rows.append(((scalars[limb] >> b) & jnp.uint32(1)) > 0)
    return jnp.stack(rows)


def _pad_pow2(points: PointBatch, scalars, n: int):
    """Pad lanes to a power of two with infinity points / zero scalars."""
    m = 1
    while m < n:
        m *= 2
    if m == n:
        return points, scalars, n
    pad = m - n
    pts = jax.tree_util.tree_map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
        ),
        points,
    )
    sc = jnp.concatenate(
        [scalars, jnp.zeros((scalars.shape[0], pad), scalars.dtype)], axis=1
    )
    return pts, sc, m


def _ladder_products(f, points: PointBatch, scalars) -> PointBatch:
    """Per-lane s_i * P_i via one 256-step double-and-add scan."""
    masks = _bit_masks_msb(scalars)  # (256, N) bool
    inf = jax.tree_util.tree_map(
        lambda a: jnp.zeros_like(a) + a[..., :1] * 0, points
    )

    def step(acc, m):
        acc = cv.double(f, acc)
        cand = cv.add_mixed(f, acc, points)
        return cv.select_point(f, m, cand, acc), None

    acc, _ = jax.lax.scan(step, inf, masks)
    return acc


def _tree_reduce_lanes(f, p: PointBatch) -> PointBatch:
    """Pair-tree reduce a power-of-two lane batch to one lane."""

    def _blen(t: PointBatch) -> int:
        leaf = t.x[0] if isinstance(t.x, tuple) else t.x
        return leaf.shape[-1]

    while _blen(p) > 1:
        even = jax.tree_util.tree_map(lambda a: a[..., 0::2], p)
        odd = jax.tree_util.tree_map(lambda a: a[..., 1::2], p)
        p = cv.add(f, even, odd)
    return p


@partial(jax.jit, static_argnums=(2,))
def _msm_ladder(points: PointBatch, scalars, fname: str) -> PointBatch:
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD
    n = scalars.shape[1]
    pts, sc, _m = _pad_pow2(points, scalars, n)
    prods = _ladder_products(f, pts, sc)
    return _tree_reduce_lanes(f, prods)


@partial(jax.jit, static_argnums=(1, 3))
def _msm_many_ladder(
    points: PointBatch, sizes, scalars, fname: str
) -> PointBatch:
    """Ladder products over all concatenated lanes, then per-problem
    pair-tree reduction. Returns a PointBatch over len(sizes) lanes."""
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD
    prods = _ladder_products(f, points, scalars)
    outs = []
    off = 0
    for sz in sizes:
        sl = jax.tree_util.tree_map(lambda a: a[..., off : off + sz], prods)
        zero_sc = jnp.zeros((scalars.shape[0], sz), scalars.dtype)
        sl, _sc, _m = _pad_pow2(sl, zero_sc, sz)
        outs.append(_tree_reduce_lanes(f, sl))
        off += sz
    return jax.tree_util.tree_map(
        lambda *ls: jnp.concatenate(list(ls), axis=-1), *outs
    )


def _neg_y_where(f, mask, p: PointBatch) -> PointBatch:
    """Negate y on masked lanes (point negation; infinity lanes stay 0)."""
    zero = jax.tree_util.tree_map(jnp.zeros_like, p.y)
    ny = f.sub(zero, p.y)
    return PointBatch(p.x, f.select(mask, ny, p.y), p.z)


def _slice_windows(p: PointBatch, nwin: int, stride: int, keep: int) -> PointBatch:
    """(..., nwin*stride) -> (..., nwin*keep): first `keep` lanes per window
    (drops the per-window sentinel buckets)."""

    def sl(a):
        lead = a.shape[:-1]
        return a.reshape(lead + (nwin, stride))[..., :keep].reshape(
            lead + (nwin * keep,)
        )

    return jax.tree_util.tree_map(sl, p)


def _weighted_reduce_tree(f, buckets: PointBatch, bsz: int) -> PointBatch:
    """Per-window weighted bucket sums R_w = sum_b (b+1) * S_wb.

    buckets: PointBatch (..., nwin * bsz), window-major, bsz a power of two.
    Returns (..., nwin).

    Pair-halving tree: with S'_j = S_2j + S_2j+1 and U = sum of odd lanes,
    V(S) = 2 V(S') - Tot + U, which unrolls to V = Tot + sum_k 2^k * U_k
    (U_k = odd-lane sum captured at halving level k). Total work ~3*bsz adds
    per window vs the 2c passes * 2^c lanes of the suffix-scan reduction —
    the saving that makes c=8 (32-window) openings affordable.
    """
    even_of = lambda t: jax.tree_util.tree_map(lambda a: a[..., 0::2], t)
    odd_of = lambda t: jax.tree_util.tree_map(lambda a: a[..., 1::2], t)

    def _blen(p: PointBatch) -> int:
        leaf = p.x[0] if isinstance(p.x, tuple) else p.x
        return leaf.shape[-1]

    us = []
    t = buckets
    m = bsz
    while m > 1:
        e, o = even_of(t), odd_of(t)
        t = cv.add(f, e, o)
        us.append(o)  # (..., nwin * m/2)
        m //= 2
    tot = t  # (..., nwin): total bucket sum per window
    nwin = _blen(tot)

    # reduce each U_k to one lane per window by pair adds
    ubars = []
    for u in us:
        while _blen(u) > nwin:
            u = cv.add(f, even_of(u), odd_of(u))
        ubars.append(u)

    # Horner: acc = Ubar_{K-1}; acc = 2 acc + Ubar_k for k = K-2..0
    acc = ubars[-1]
    for u in reversed(ubars[:-1]):
        acc = cv.add(f, cv.double(f, acc), u)
    return cv.add(f, tot, acc)


def _tree_roll_masked(p: PointBatch, dist, fill: PointBatch, n: int) -> PointBatch:
    """out[i] = p[i - dist] for i >= dist else fill[i]; dist may be traced.

    Implemented as a circular roll plus a lane mask so the shift distance can
    be a loop-carried value inside lax.fori_loop (keeps the scan body traced
    once instead of unrolled per distance)."""
    lane = jnp.arange(n)
    valid = lane >= dist  # (n,)

    def sh(a, fa):
        rolled = jnp.roll(a, dist, axis=-1)
        return jnp.where(valid, rolled, fa)

    return jax.tree_util.tree_map(sh, p, fill)


def _bucket_accumulate(f, ps, ks, seg_start, glen, inf_t, inf_g, total):
    """Sorted (point, key) lanes -> per-key bucket sums (PointBatch, glen).

    Two strategies, chosen by average segment length (= total/glen), both
    data-oblivious in SHAPE with data-dependent trip counts (lax.while_loop —
    worst case bounded, adversarial scalars only cost time, never
    correctness):

    - dense (avg >= 1): serial-within-bucket accumulation. Each bucket walks
      its contiguous segment one element per step, all glen buckets in
      parallel: ~max_segment_length steps of glen-lane adds ≈ ONE add per
      point total (for uniform digits max_segment ≈ avg + few sqrt(avg)).
      This beats the segmented scan's total*log(seg) adds ~3x at 2^14.
    - sparse (avg < 4): Hillis-Steele segmented inclusive scan over lanes
      (log2(max_segment) full-width passes, early-exit while_loop), then
      segment-end extraction scattered into buckets.
    """
    lane = jnp.arange(total)

    # static cost model: the walk does ~glen * max_segment MIXED adds
    # (estimate max_seg ~ avg + 3 sqrt(avg) + 2 for random digits); the
    # segmented scan does ~total * log2(max_seg) FULL adds (~1.33x a mixed
    # add). Both shapes are static, so the choice is too.
    avg = total / glen
    est_seg = avg + 3.0 * avg ** 0.5 + 2.0
    walk_cost = 0.75 * glen * est_seg
    hs_cost = total * max(1.0, np.ceil(np.log2(est_seg)))
    if walk_cost <= hs_cost:
        # --- strided-within-bucket walk with S sub-walkers per bucket:
        # walker s of bucket b consumes segment offsets s, s+S, s+2S, ... so
        # the while_loop runs ~avg_segment/S (+deviation/S) steps; the S
        # partials then merge with log2(S) halving adds. Total adds stay
        # ~one per point; the sequential step count (each step is one
        # batched add at glen*S lanes) drops by S.
        avg = total // glen
        s_sub = 1
        while s_sub < 32 and avg // s_sub > 8:
            s_sub *= 2
        wl = glen * s_sub
        idx = jnp.where(seg_start, ks, glen)
        starts = (
            jnp.full((glen,), total, dtype=jnp.int32)
            .at[idx]
            .set(lane.astype(jnp.int32), mode="drop")
        )
        starts_w = jnp.repeat(starts, s_sub) + jnp.tile(
            jnp.arange(s_sub, dtype=jnp.int32), glen
        )
        bucket_ids_w = jnp.repeat(jnp.arange(glen, dtype=ks.dtype), s_sub)
        inf_w = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[:-1] + (wl,), a.dtype) + a[..., :1] * 0,
            inf_g,
        )

        def cond(state):
            _t, _acc, alive = state
            return alive

        def step(state):
            t, acc, _alive = state
            pos = starts_w + t * s_sub
            inb = pos < total
            posc = jnp.where(inb, pos, 0)
            valid = inb & (jnp.take(ks, posc) == bucket_ids_w)
            g = _tree_take(ps, posc)
            # bases are affine-encoded (keygen normalizes; Z in {0,1}), so
            # the cheaper mixed add applies (~30% fewer field muls)
            cand = cv.add_mixed(f, acc, g)
            acc = cv.select_point(f, valid, cand, acc)
            return t + 1, acc, jnp.any(valid)

        _t, acc, _ = jax.lax.while_loop(
            cond, step, (jnp.int32(0), inf_w, jnp.bool_(True))
        )
        # merge sub-walker partials (pairs adjacent in the s axis)
        while s_sub > 1:
            acc = cv.add(
                f,
                jax.tree_util.tree_map(lambda a: a[..., 0::2], acc),
                jax.tree_util.tree_map(lambda a: a[..., 1::2], acc),
            )
            s_sub //= 2
        return acc

    # --- segmented scan (sparse): state (step, acc, reached_start flags)
    logt = max(1, (total - 1).bit_length())

    def hs_cond(state):
        s, _acc, reached = state
        return (s < logt) & ~jnp.all(reached)

    def hs_step(state):
        s, acc, reached = state
        dist = jnp.int32(1) << s
        shifted = _tree_roll_masked(acc, dist, inf_t, total)
        r_shift = jnp.where(lane >= dist, jnp.roll(reached, dist), True)
        take = ~reached  # lanes that still extend into the left neighbor
        cand = cv.add(f, shifted, acc)
        new_acc = cv.select_point(f, take, cand, acc)
        return s + 1, new_acc, reached | r_shift

    _s, acc, _r = jax.lax.while_loop(
        hs_cond, hs_step, (jnp.int32(0), ps, seg_start)
    )
    # segment ends: next element starts a new segment (or last element)
    next_start = jnp.concatenate([seg_start[1:], jnp.ones(1, bool)])
    idx = jnp.where(next_start, ks, glen)  # out-of-range -> dropped
    return jax.tree_util.tree_map(
        lambda b, a: b.at[..., idx].set(a, mode="drop"), inf_g, acc
    )


def msm(points: PointBatch, scalars, fname: str = "fp", c: int = 8) -> PointBatch:
    """MSM: sum_i scalars[i] * points[i].

    points: PointBatch batched over N (Jacobian, Montgomery coords).
    scalars: (16, N) canonical (non-Montgomery) Fr limbs.
    fname: "fp" (G1) or "fp2" (G2). Returns a single Jacobian point (batch 1).

    Dispatch (trace-time static on N): at or below SPARTAN_MSM_LADDER_MAX
    lanes the compile-cheap double-and-add ladder runs (_msm_ladder); above
    it the Pippenger pipeline (msm_pippenger). Identical group results.
    """
    if scalars.shape[1] <= _LADDER_MAX:
        return _msm_ladder(points, scalars, fname)
    return msm_pippenger(points, scalars, fname, c)


@partial(jax.jit, static_argnums=(2, 3))
def msm_pippenger(
    points: PointBatch, scalars, fname: str = "fp", c: int = 8
) -> PointBatch:
    """Pippenger MSM: signed c-bit windows (half the buckets of unsigned;
    negated-base lanes negate y up front, free for affine bases) + pair-tree
    weighted bucket reduction (see _weighted_reduce_tree)."""
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD
    n = scalars.shape[1]
    buckets_d, negs = signed_digits(scalars, c)  # (nw, N)
    nw = buckets_d.shape[0]
    half = 1 << (c - 1)
    stride = half + 1  # per-window layout: half real buckets + 1 sentinel

    # infinities derived from `points` so lax-loop carries inherit shard_map
    # varying axes (plain constants break scan typechecking under shard_map)
    def _zeros_sized(size: int) -> PointBatch:
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[:-1] + (size,), a.dtype) + a[..., :1] * 0,
            points,
        )

    inf_1 = _zeros_sized(1)

    # Window grouping: process `chunk` windows per scan step so the tiled
    # lane count stays within a memory budget (chunk*N <= MAX_LANES); at
    # bench sizes all windows fit in one group (scan of length 1).
    max_lanes = 1 << 21
    chunk = max(1, min(nw, max_lanes // max(1, n)))
    while nw % chunk:
        chunk -= 1
    ngroups = nw // chunk

    total = chunk * n
    glen = chunk * stride
    inf_t = _zeros_sized(total)
    inf_g = _zeros_sized(glen)

    def group_buckets(_, dg_ng):
        """(chunk, N) digits+negs -> (..., chunk * stride) buckets.

        Composite key = within-group-window * stride + bucket: one argsort
        keeps windows contiguous (key is window-major) and bucket-sorted
        inside, so a single pass covers every window in the group. Zero
        digits land in the per-window sentinel bucket (discarded later)."""
        dg, ng = dg_ng
        key = (
            jnp.arange(chunk, dtype=jnp.int32)[:, None] * stride + dg
        ).reshape(-1)  # (chunk*N,)
        order = jnp.argsort(key)
        ks = jnp.take(key, order)
        ps = _tree_take(points, order % n)  # tiled points in sorted key order
        ps = _neg_y_where(f, jnp.take(ng.reshape(-1), order), ps)

        # segment starts: first lane, or key change (bucket OR window change)
        prev_k = jnp.concatenate([ks[:1] - 1, ks[:-1]])
        seg_start = ks != prev_k  # (chunk*N,) bool
        buckets = _bucket_accumulate(
            f, ps, ks, seg_start, glen, inf_t, inf_g, total
        )
        return None, buckets

    if ngroups == 1:
        _, flat = group_buckets(None, (buckets_d, negs))
    else:
        _, stacked = jax.lax.scan(
            group_buckets,
            None,
            (buckets_d.reshape(ngroups, chunk, n), negs.reshape(ngroups, chunk, n)),
        )
        flat = jax.tree_util.tree_map(
            lambda a: jnp.moveaxis(a, 0, -2).reshape(
                a.shape[1:-1] + (nw * stride,)
            ),
            stacked,
        )

    # drop sentinel buckets, then weighted reduction (pair tree)
    flat = _slice_windows(flat, nw, stride, half)
    wsums = _weighted_reduce_tree(f, flat, half)  # (..., nw)

    # Horner combine across windows (MSB window first)
    def window_step(result, w):
        result = jax.lax.fori_loop(0, c, lambda _, r: cv.double(f, r), result)
        result = cv.add(f, result, _tree_take(wsums, w[None]))
        return result, None

    ws = jnp.arange(nw - 1, -1, -1, dtype=jnp.int32)
    result, _ = jax.lax.scan(window_step, inf_1, ws)
    return result


def msm_many(
    points: PointBatch, sizes, scalars, fname: str = "fp", c: int = 8
) -> PointBatch:
    """L independent MSMs fused into ONE program.

    points: PointBatch over sum(sizes) (concatenated per-problem bases).
    sizes: static tuple of per-problem point counts. scalars: (16, sum(sizes))
    canonical. Returns a PointBatch batched over len(sizes) (Jacobian).

    Dispatch (trace-time static): at or below SPARTAN_MSM_LADDER_MAX total
    lanes the compile-cheap ladder runs (_msm_many_ladder); above it the
    fused Pippenger (msm_many_pippenger). Identical group results.
    """
    sizes = tuple(int(s) for s in sizes)
    if sum(sizes) <= _LADDER_MAX:
        return _msm_many_ladder(points, sizes, scalars, fname)
    return msm_many_pippenger(points, sizes, scalars, fname, c)


@partial(jax.jit, static_argnums=(1, 3, 4))
def msm_many_pippenger(
    points: PointBatch, sizes, scalars, fname: str = "fp", c: int = 8
) -> PointBatch:
    """L independent Pippenger MSMs fused into ONE program.

    The opening proof needs one MSM per variable over shrinking tables
    (reference src/commitment/open.rs:37-51 runs them serially); issuing them
    as separate programs repeats the full sort + scan pass structure per
    level. Here a composite key (problem, window, digit) lets a single
    argsort + one segmented scan + one bucket reduction cover every level at
    once — total lane count equals ONE MSM over the concatenated points, so
    the whole opening costs about as much as the commit.
    """
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD
    sizes = tuple(int(s) for s in sizes)
    n = sum(sizes)
    L = len(sizes)
    assert scalars.shape[1] == n
    buckets_d, negs = signed_digits(scalars, c)  # (nw, N)
    nw = buckets_d.shape[0]
    half = 1 << (c - 1)
    stride = half + 1  # half real buckets + 1 zero-digit sentinel per window

    def _zeros_sized(size: int) -> PointBatch:
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[:-1] + (size,), a.dtype) + a[..., :1] * 0,
            points,
        )

    pid = np.repeat(np.arange(L, dtype=np.int32), np.asarray(sizes))  # (N,)
    w_ids = jnp.arange(nw, dtype=jnp.int32)[:, None]
    key = ((jnp.asarray(pid)[None, :] * nw + w_ids) * stride + buckets_d).reshape(-1)
    order = jnp.argsort(key)
    ks = jnp.take(key, order)
    ps = _tree_take(points, order % n)  # lane (w, i) -> point i, sorted
    ps = _neg_y_where(f, jnp.take(negs.reshape(-1), order), ps)

    # The key is problem-major and every problem occupies EXACTLY nw*N_l
    # sorted lanes (its digit count is data-independent; sentinel buckets
    # stay inside their own window's key range), so each problem is a STATIC
    # contiguous slice of the sorted arrays. Problems are bucket-accumulated
    # in BANDS of similar average segment length (factor-4 spread): one
    # _bucket_accumulate instance per band instead of one per level. This
    # keeps the dense/sparse strategy choice sharp (the walk's trip count is
    # the band's max segment length, within 4x of every member's average)
    # while cutting the traced program to a handful of instances — the
    # per-level version traced 14 while_loop machineries at 2^14 and cost
    # ~2 min of tracing + MLIR conversion and a 300 MB executable.
    glen_1 = nw * stride

    def band(sz: int) -> int:
        return max(0, (sz // stride)).bit_length() // 2

    groups = []  # (level_start, level_count)
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
            _bucket_accumulate(
                f, ps_g, ks_g, ks_g != prev, glen_g,
                _zeros_sized(t_g), _zeros_sized(glen_g), t_g,
            )
        )
        off += t_g
    buckets = jax.tree_util.tree_map(
        lambda *ls: jnp.concatenate(list(ls), axis=-1), *per_group
    )

    # drop sentinels, pair-tree weighted reduction over all L*nw windows
    buckets = _slice_windows(buckets, L * nw, stride, half)
    wsums = _weighted_reduce_tree(f, buckets, half)  # (..., L*nw)
    wsums = jax.tree_util.tree_map(
        lambda a: a.reshape(a.shape[:-1] + (L, nw)), wsums
    )

    # Horner across windows, batched over the L problems (dynamic index
    # over the minor window axis, (..., L) result lanes)
    def window_step(result, w):
        result = jax.lax.fori_loop(0, c, lambda _, r: cv.double(f, r), result)
        col = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, w, axis=-1, keepdims=False),
            wsums,
        )
        return cv.add(f, result, col), None

    ws = jnp.arange(nw - 1, -1, -1, dtype=jnp.int32)
    result, _ = jax.lax.scan(window_step, _zeros_sized(L), ws)
    return result


@partial(jax.jit, static_argnums=(2, 3))
def fixed_base_msm(table: PointBatch, scalars, fname: str = "fp", c: int = 8) -> PointBatch:
    """Windowed fixed-base exponentiation: out[i] = scalars[i] * G.

    table: PointBatch of shape (..., nw * 2^c): precomputed
    ``table[w * 2^c + d] = d * 2^(c*w) * G`` (built host-side by
    ``fixed_base_table``). scalars: (16, N) canonical limbs.
    Returns PointBatch batched over N. Work: nw batched adds total.
    """
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD
    n = scalars.shape[1]
    digits = digits_from_limbs(scalars, c)  # (nw, N)
    nw = digits.shape[0]
    nbuckets = 1 << c

    def step(acc, wd):
        w, d = wd
        idx = w * nbuckets + d  # (N,)
        g = _tree_take(table, idx)
        return cv.add_mixed(f, acc, g), None  # table is affine-encoded

    ws = jnp.arange(nw, dtype=jnp.int32)
    init = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape[:-1] + (n,), a.dtype) + a[..., :1] * 0, table
    )
    acc, _ = jax.lax.scan(step, init, (ws, digits))
    return acc


def fixed_base_table_host(base_pt, ops, c: int = 8, nbits: int = 256):
    """Host: build the fixed-base window table [d * 2^(c w) * G] as affine points.

    base_pt: host affine point; ops: host CurveOps (G1 or G2).
    Returns list of length (nbits // c) * 2^c (None = infinity).
    Kept as the oracle for fixed_base_table_device (naive-vs-fast pattern).
    """
    nw = nbits // c
    out = []
    window_base = base_pt
    for _ in range(nw):
        acc = None
        for _d in range(1 << c):
            out.append(acc)
            acc = ops.add(acc, window_base)
        # next window base: 2^c * current
        for _ in range(c):
            window_base = ops.double(window_base)
    return out


def fixed_base_table_device(base_pt, ops, encode, fname: str, c: int = 8, nbits: int = 256) -> PointBatch:
    """Build the fixed-base window table on DEVICE with c batched adds.

    table[w * 2^c + d] = d * 2^(c*w) * G. The host contributes only the
    nbits doublings 2^j * G (fast Python bigints); the (nbits/c) * 2^c
    entries then assemble on device as a bit ladder: for each bit j of the
    in-window digit d, one masked batched add of the precomputed 2^(c*w+j)*G
    across all (window, digit) lanes at once. Replaces a 2^c-per-window host
    point loop (the reference's FixedBaseMSM window table is built host-side
    too, src/commitment/setup.rs:61-69 — the former dominant keygen cost).

    base_pt: host affine point; ops: host CurveOps; encode: cv.g1_encode or
    cv.g2_encode; fname: "fp" | "fp2". Returns a Jacobian PointBatch of
    length (nbits // c) * 2^c.
    """
    f = cv.G1_FIELD if fname == "fp" else cv.G2_FIELD
    nw = nbits // c
    doubles = []
    p = base_pt
    for _ in range(nbits):
        doubles.append(p)
        p = ops.double(p)
    dbl = encode(doubles)  # (..., nbits): 2^j * G, Jacobian Z=1

    n = nw << c
    digit = jnp.arange(n, dtype=jnp.uint32) & jnp.uint32((1 << c) - 1)
    window = jnp.arange(n, dtype=jnp.int32) >> c

    acc = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape[:-1] + (n,), a.dtype), dbl
    )  # all-infinity (Z=0)

    @partial(jax.jit, static_argnums=())
    def build(dbl, acc):
        def bit_step(j, acc):
            idx = window * c + j  # (n,): which power 2^(c*w + j)
            g = _tree_take(dbl, idx)
            cand = cv.add(f, acc, g)
            take = ((digit >> j.astype(jnp.uint32)) & jnp.uint32(1)) > 0
            return cv.select_point(f, take, cand, acc)

        return jax.lax.fori_loop(0, c, bit_step, acc)

    return build(dbl, acc)
