"""Batched-instance proving: B proofs of one circuit in shared device dispatches.

The data-parallel scale-out config (SURVEY.md §2.3; BASELINE.json throughput
target: 64 independent 2^16 instances pipelined). The ``prove_batch`` convenience below loops
``prove`` per instance — correct, but each proof pays its own dispatch +
host-sync latency. This module stacks the instances on a device batch axis:

- MLE/sumcheck tables become (16, B, N); folds, round evaluations and the
  device Fiat–Shamir transcript (states (B, 8)) advance all B instances in
  ONE dispatch per phase (sumcheck 1 + round 4 is one program, sumcheck 2 is
  one program, exactly like protocol/fused.py but batched).
- The commit / opening MSMs are dispatched for every instance back-to-back
  and decoded with a single host fetch per stage (the device pipelines them).
- Sparse A·z/B·z/C·z and M(r_x,·) use batched gather/segment-sum kernels
  (one dispatch per matrix for the whole batch).

Each instance keeps its own transcript (it absorbs its own public input —
reference src/lib.rs:65), so the emitted proofs are bit-identical to what B
independent ``MLArgumentForR1CS.prove`` calls produce (asserted in
tests/test_batch.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.host import field as hf
from spartan_tpu.ops import curve as cv
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import fs_device as fsd
from spartan_tpu.ops import mle
from spartan_tpu.ops import msm as msm_mod
from spartan_tpu.ops import sumcheck as sck
from spartan_tpu.ops.field import FR
from spartan_tpu.commitment import PublicParameter
from spartan_tpu.commitment.data_structures import Commitment, OpenProof
from spartan_tpu.protocol import prover as pr
from spartan_tpu.protocol import sumcheck as sc
from spartan_tpu.protocol.indexer import IndexPK
from spartan_tpu.protocol.proof import Proof
from spartan_tpu.utils import serialize as ser
from spartan_tpu.utils.errors import invalid_arg
from spartan_tpu.utils.timers import span
from spartan_tpu.utils.transcript import Blake2sRng

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Batched MLE / eq kernels: tables are (16, B, N)
# ---------------------------------------------------------------------------


def fold_b(table, r):
    """Fix variable 0 per instance: table (16, B, N), r (16, B) Montgomery."""
    k, b, n = table.shape
    pairs = table.reshape(k, b, n // 2, 2)
    even, odd = pairs[..., 0], pairs[..., 1]
    diff = fo.sub(FR, odd, even)
    return fo.add(FR, even, fo.mont_mul(FR, diff, r[:, :, None]))


def eq_suffix_tables_b(ts):
    """Suffix eq tables of per-instance points ts (16, B, L) Montgomery.

    Returns list S[j] of (16, B, 2^(L-j)); S[L] is constant-1. Batched form
    of ops/mle.eq_suffix_tables (same LSB-first layout)."""
    k, b, nv = ts.shape
    one = fo.ones_mont(FR, (b, 1))
    tables = [None] * (nv + 1)
    tables[nv] = one
    for j in range(nv - 1, -1, -1):
        tj = ts[:, :, j : j + 1]
        nxt = tables[j + 1]
        lo = fo.mont_mul(FR, nxt, fo.sub(FR, one, tj))
        hi = fo.mont_mul(FR, nxt, tj)
        m = nxt.shape[2]
        tables[j] = jnp.stack([lo, hi], axis=3).reshape(k, b, 2 * m)
    return tables


def eq_table_b(ts):
    """Full eq(t, x) tables per instance: ts (16, B, L) -> (16, B, 2^L)."""
    k, b, nv = ts.shape
    one = fo.ones_mont(FR, (b, 1))
    table = one
    for i in range(nv):
        ti = ts[:, :, i : i + 1]
        hi = fo.mont_mul(FR, table, ti)
        lo = fo.mont_mul(FR, table, fo.sub(FR, one, ti))
        table = jnp.concatenate([lo, hi], axis=2)
    return table


# ---------------------------------------------------------------------------
# Batched sparse matrix kernels (shared COO, per-instance tables)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(4,))
def gather_mul_segsum_b(gather_idx, scatter_idx, vals, table, n_out: int):
    """Batched ops/sparse.gather_mul_segsum: table (16, B, N) -> (16, B, n_out)."""
    gathered = jnp.take(table, gather_idx, axis=2)  # (16, B, nnz)
    prods = fo.mont_mul(FR, vals[:, None, :], gathered)
    acc = jax.ops.segment_sum(
        jnp.moveaxis(prods, -1, 0), scatter_idx, num_segments=n_out
    )  # (n_out, 16, B)
    return fo.reduce_wide(FR, jnp.moveaxis(acc, 0, -1))


@partial(jax.jit, static_argnums=(5, 6))
def gather_mul_segsum_2stage_b(
    gather_idx, sub_idx, sub_to_seg, vals, table, n_sub: int, n_out: int
):
    """Batched two-stage segment sum for >= 2^16-entry segments
    (ops/sparse.gather_mul_segsum_2stage with a B axis)."""
    gathered = jnp.take(table, gather_idx, axis=2)  # (16, B, nnz)
    prods = fo.mont_mul(FR, vals[:, None, :], gathered)
    acc = jax.ops.segment_sum(
        jnp.moveaxis(prods, -1, 0), sub_idx, num_segments=n_sub
    )
    partials = fo.reduce_wide(FR, jnp.moveaxis(acc, 0, -1))  # (16, B, n_sub)
    acc2 = jax.ops.segment_sum(
        jnp.moveaxis(partials, -1, 0), sub_to_seg, num_segments=n_out
    )
    return fo.reduce_wide(FR, jnp.moveaxis(acc2, 0, -1))


def _dispatch_b(gather_idx, scatter_idx, aux, vals, table, n_out: int):
    if aux is None:
        return gather_mul_segsum_b(gather_idx, scatter_idx, vals, table, n_out)
    sub_idx, sub_to_seg = aux
    return gather_mul_segsum_2stage_b(
        gather_idx, sub_idx, sub_to_seg, vals, table,
        int(sub_to_seg.shape[0]), n_out,
    )


def sum_over_y_b(coo, z, n: int):
    rows, cols, vals = coo[0], coo[1], coo[2]
    aux = coo[3] if len(coo) > 3 else None
    return _dispatch_b(cols, rows, aux, vals, z, n)


def eval_on_x_table_b(coo, eqx, n: int):
    rows, cols, vals = coo[0], coo[1], coo[2]
    aux = coo[4] if len(coo) > 4 else None
    return _dispatch_b(rows, cols, aux, vals, eqx, n)


# ---------------------------------------------------------------------------
# Batched fused sumcheck phases (device FS states (B, 8))
# ---------------------------------------------------------------------------


def _cb(x: int):
    """Host int -> (16, 1, 1) Montgomery constant."""
    return fo.encode_mont(FR, [x % hf.R])[:, :, None]


def _halves_b(tab):
    k, b, n = tab.shape
    p = tab.reshape(k, b, n // 2, 2)
    return p[..., 0], p[..., 1]


def _sum_b(tab):
    """(16, B, M) -> (16, B, 1) canonical-Montgomery modular sum."""
    return mle.sum_mod(tab)


def sc1_evals3_b(az, bz, cz, s_table):
    """Inner SC1 quadratic at t = 0,1,2, batched: returns (16, B, 3)."""
    az_e, az_o = _halves_b(az)
    bz_e, bz_o = _halves_b(bz)
    cz_e, cz_o = _halves_b(cz)
    az_d = fo.sub(FR, az_o, az_e)
    bz_d = fo.sub(FR, bz_o, bz_e)
    cz_d = fo.sub(FR, cz_o, cz_e)
    outs = []
    az_t, bz_t, cz_t = az_e, bz_e, cz_e
    for t in range(3):
        if t > 0:
            az_t = fo.add(FR, az_t, az_d)
            bz_t = fo.add(FR, bz_t, bz_d)
            cz_t = fo.add(FR, cz_t, cz_d)
        val = fo.sub(FR, fo.mont_mul(FR, az_t, bz_t), cz_t)
        val = fo.mont_mul(FR, val, s_table)
        outs.append(_sum_b(val))
    return jnp.concatenate(outs, axis=2)


def prod2_evals3_b(w, z):
    w_e, w_o = _halves_b(w)
    z_e, z_o = _halves_b(z)
    w_d = fo.sub(FR, w_o, w_e)
    z_d = fo.sub(FR, z_o, z_e)
    outs = []
    w_t, z_t = w_e, z_e
    for t in range(3):
        if t > 0:
            w_t = fo.add(FR, w_t, w_d)
            z_t = fo.add(FR, z_t, z_d)
        outs.append(_sum_b(fo.mont_mul(FR, w_t, z_t)))
    return jnp.concatenate(outs, axis=2)


def _feed_fr_vec_b(state, limbs):
    """Absorb ser_fr_vec per instance: limbs (16, B, n) canonical, state (B, 8)."""
    b, n = limbs.shape[1], limbs.shape[2]
    words = fsd.limbs_to_words(limbs).reshape(b, n * 8)
    prefix = jnp.broadcast_to(jnp.asarray([n, 0], U32), (b, 2))
    return fsd.fs_feed(state, jnp.concatenate([prefix, words], axis=-1))


def _sample_mont_b(state, counter):
    """One Fr sample per instance: ((16,B) canonical, (16,B) mont, ctr (B,))."""
    r, counter = fsd.fs_sample_fr(state, counter)  # (16, B)
    return r, fo.to_mont(FR, r), counter


def _ell_at_b(tor_i, t: int):
    """l_i(t) for constant t: tor_i (16, B, 1) -> (16, B, 1)."""
    return fo.add(FR, fo.mont_mul(FR, tor_i, _cb(2 * t - 1)), _cb(1 - t))


def _ell_at_r_b(tor_i, r):
    """l_i(r) for traced r (16, B, 1): 2 tor_i r - tor_i - r + 1."""
    t2 = fo.mont_mul(FR, tor_i, r)
    out = fo.add(FR, t2, t2)
    out = fo.sub(FR, out, tor_i)
    out = fo.sub(FR, out, r)
    return fo.add(FR, out, _cb(1))


def _emit_consts_b(deg: int):
    """fused._emit_consts rows broadcast for the batch layout: (16, 1, D)."""
    from spartan_tpu.protocol import fused

    return tuple(c[:, None, :] for c in fused._emit_consts(deg))


def _sc1_emit_core_b(q, tor_i, pre, state, c0, c1, c2, ea, eb):
    """Batched twin of fused._sc1_emit_core: q (16,B,3) -> deg+1 wire evals,
    absorb, sample. Returns (ev, r (16,B), r_mont (16,B), pre', state')."""
    q0, q1, q2 = q[..., 0:1], q[..., 1:2], q[..., 2:3]
    qt = fo.add(
        FR,
        fo.mont_mul(FR, q0, c0),
        fo.add(FR, fo.mont_mul(FR, q1, c1), fo.mont_mul(FR, q2, c2)),
    )  # (16, B, D)
    ell = fo.add(FR, fo.mont_mul(FR, tor_i, ea), eb)
    ev = fo.from_mont(FR, fo.mont_mul(FR, pre, fo.mont_mul(FR, ell, qt)))
    state = _feed_fr_vec_b(state, ev)
    r, r_mont, _ = _sample_mont_b(state, jnp.uint32(0))
    pre2 = fo.mont_mul(FR, pre, _ell_at_r_b(tor_i, r_mont[:, :, None]))
    return ev, r, r_mont, pre2, state


_sc1_emit_b = jax.jit(_sc1_emit_core_b)


@jax.jit
def _sc1_step_b(az, bz, cz, s, r_mont):
    az = fold_b(az, r_mont)
    bz = fold_b(bz, r_mont)
    cz = fold_b(cz, r_mont)
    return sc1_evals3_b(az, bz, cz, s), az, bz, cz


@jax.jit
def _sc1_first_b(az, bz, cz, s):
    return sc1_evals3_b(az, bz, cz, s)


def _pad_b(t, w: int):
    if t.shape[-1] == w:
        return t
    return jnp.concatenate(
        [t, jnp.zeros(t.shape[:-1] + (w - t.shape[-1],), t.dtype)], axis=-1
    )


@jax.jit
def _sc1_tail_phase_b(az, bz, cz, suffix_tail, tor_tail, pre, r_mont, state,
                      c0, c1, c2, ea, eb):
    """All tail rounds + round 4 for the whole batch, ONE scan program
    (same program-shape rationale as protocol/fused.py)."""
    w = sck.TAIL_W
    az, bz, cz = _pad_b(az, w), _pad_b(bz, w), _pad_b(cz, w)
    s_stack = jnp.stack([_pad_b(s, w // 4) for s in suffix_tail])
    tor_xs = jnp.moveaxis(tor_tail, 2, 0)[:, :, :, None]  # (T, 16, B, 1)

    def body(carry, xs):
        az, bz, cz, pre, r_mont, state = carry
        s, tor_i = xs
        az = fold_b(az, r_mont)
        bz = fold_b(bz, r_mont)
        cz = fold_b(cz, r_mont)
        q = sc1_evals3_b(az, bz, cz, s)
        ev, r, r_mont, pre, state = _sc1_emit_core_b(
            q, tor_i, pre, state, c0, c1, c2, ea, eb
        )
        repad = lambda t: jnp.concatenate([t, jnp.zeros_like(t)], axis=-1)
        return (repad(az), repad(bz), repad(cz), pre, r_mont, state), (ev, r)

    (az, bz, cz, _pre, r_mont, state), (evs, rs) = jax.lax.scan(
        body, (az, bz, cz, pre, r_mont, state), (s_stack, tor_xs)
    )

    az = fold_b(az[..., :2], r_mont)
    bz = fold_b(bz[..., :2], r_mont)
    cz = fold_b(cz[..., :2], r_mont)
    vabc = fo.from_mont(FR, jnp.concatenate([az, bz, cz], axis=2))  # (16, B, 3)
    words = fsd.limbs_to_words(vabc).reshape(vabc.shape[1], 24)
    state = fsd.fs_feed(state, words)
    ra, _, ctr = _sample_mont_b(state, jnp.uint32(0))
    rb, _, ctr = _sample_mont_b(state, ctr)
    rc, _, _ = _sample_mont_b(state, ctr)
    return evs, rs, vabc, jnp.stack([ra, rb, rc], axis=2), state


def sc1_phase_b(az, bz, cz, tor_mont, state):
    """Sumcheck 1 + round 4 for a whole batch, device-resident transcript.

    az/bz/cz: (16, B, n); tor_mont: (16, B, log_n); state: (B, 8).
    Returns (evals (log_n, 16, B, deg+1) canonical, rs (16, B, log_n)
    canonical, vabc (16, B, 3), rabc (16, B, 3), state' (B, 8)).
    Batched twin of protocol/fused.sc1_phase (same bytes per instance)."""
    from spartan_tpu.protocol import fused

    log_n = tor_mont.shape[2]
    deg = log_n + 2
    consts = _emit_consts_b(deg)
    suffix = eq_suffix_tables_b(tor_mont)
    i0 = fused._tail_start(log_n)

    if log_n < 2:
        raise ValueError("batched proving requires log_n >= 2")
    pre = fo.ones_mont(FR, (az.shape[1], 1))
    r_mont = jnp.zeros((16, az.shape[1]), U32)  # dummy for the no-fold round
    evals_out, rs_out = [], []
    for i in range(i0):
        if i == 0:
            q = _sc1_first_b(az, bz, cz, suffix[1])
        else:
            q, az, bz, cz = _sc1_step_b(az, bz, cz, suffix[i + 1], r_mont)
        ev, r, r_mont, pre, state = _sc1_emit_b(
            q, tor_mont[:, :, i : i + 1], pre, state, *consts
        )
        evals_out.append(ev)
        rs_out.append(r)

    evs, rs, vabc, rabc, state = _sc1_tail_phase_b(
        az, bz, cz, tuple(suffix[i0 + 1 :]), tor_mont[:, :, i0:], pre, r_mont,
        state, *consts,
    )
    evals = jnp.concatenate([jnp.stack(evals_out, axis=0), evs], axis=0)
    rs_all = jnp.concatenate(
        [jnp.stack(rs_out, axis=2), jnp.moveaxis(rs, 0, 2)], axis=2
    )
    return evals, rs_all, vabc, rabc, state


@jax.jit
def _sc2_step_b(w, z, r_mont):
    w = fold_b(w, r_mont)
    z = fold_b(z, r_mont)
    return prod2_evals3_b(w, z), w, z


def _sc2_emit_core_b(q, state):
    ev = fo.from_mont(FR, q)
    state = _feed_fr_vec_b(state, ev)
    r, r_mont, _ = _sample_mont_b(state, jnp.uint32(0))
    return ev, r, r_mont, state


_sc2_emit_b = jax.jit(_sc2_emit_core_b)


@jax.jit
def _sc2_tail_phase_b(w_tab, z_tab, r_mont, state):
    w = sck.TAIL_W
    t_rounds = int(w_tab.shape[2]).bit_length() - 2
    w_tab, z_tab = _pad_b(w_tab, w), _pad_b(z_tab, w)

    def body(carry, _):
        w_tab, z_tab, r_mont, state = carry
        w_tab = fold_b(w_tab, r_mont)
        z_tab = fold_b(z_tab, r_mont)
        q = prod2_evals3_b(w_tab, z_tab)
        ev, r, r_mont, state = _sc2_emit_core_b(q, state)
        repad = lambda t: jnp.concatenate([t, jnp.zeros_like(t)], axis=-1)
        return (repad(w_tab), repad(z_tab), r_mont, state), (ev, r)

    (w_tab, z_tab, r_mont, state), (evs, rs) = jax.lax.scan(
        body, (w_tab, z_tab, r_mont, state), None, length=t_rounds
    )
    return evs, rs, state


def sc2_phase_b(w, z, state):
    """Sumcheck 2 for a whole batch (deg-2 rounds over w·z).

    w/z: (16, B, n); state: (B, 8). Returns (evals (log_n, 16, B, 3)
    canonical, rs (16, B, log_n) canonical, state' (B, 8))."""
    from spartan_tpu.protocol import fused

    n = int(w.shape[2])
    log_n = n.bit_length() - 1
    i0 = fused._tail_start(log_n)
    if log_n < 2:
        raise ValueError("batched proving requires log_n >= 2")
    r_mont = jnp.zeros((16, w.shape[1]), U32)
    evals_out, rs_out = [], []
    for i in range(i0):
        if i == 0:
            q = jax.jit(prod2_evals3_b)(w, z)
        else:
            q, w, z = _sc2_step_b(w, z, r_mont)
        ev, r, r_mont, state = _sc2_emit_b(q, state)
        evals_out.append(ev)
        rs_out.append(r)
    evs, rs, state = _sc2_tail_phase_b(w, z, r_mont, state)
    evals = jnp.concatenate([jnp.stack(evals_out, axis=0), evs], axis=0)
    rs_all = jnp.concatenate(
        [jnp.stack(rs_out, axis=2), jnp.moveaxis(rs, 0, 2)], axis=2
    )
    return evals, rs_all, state


# ---------------------------------------------------------------------------
# Commit / open for many polynomials: dispatch all, fetch once
# ---------------------------------------------------------------------------


def commit_many(pp: PublicParameter, polys: List) -> List[Commitment]:
    """Dispatch every instance's G1 commit MSM, then decode with ONE fetch."""
    results = []
    for poly in polys:
        scalars = fo.from_mont(FR, poly)
        results.append(msm_mod.msm(pp.powers_of_g[0], scalars, "fp"))
    stacked = np.asarray(
        jnp.concatenate([jnp.concatenate([r.x, r.y, r.z], axis=1) for r in results],
                        axis=1)
    )  # (16, 3B) Fp Montgomery limbs
    out = []
    for i in range(len(results)):
        pt = cv.g1_decode(
            cv.PointBatch(
                stacked[:, 3 * i : 3 * i + 1],
                stacked[:, 3 * i + 1 : 3 * i + 2],
                stacked[:, 3 * i + 2 : 3 * i + 3],
            )
        )[0]
        out.append(Commitment(nv=pp.nv, g_product=pt))
    return out


def open_many(pp: PublicParameter, polys: List, points: List[List[int]]):
    """PST opens for many (poly, point) pairs, fetched with 2 host syncs.

    Per instance, ONE fused quotient-ladder program
    (commitment/scheme._quotients_and_eval); the level MSMs of ALL instances
    are then fused into the same banded composite-key msm_many programs the
    single-proof opening uses (c=8 big levels / c=4 tail levels) — instances
    share level sizes, so a batch of B proofs costs the same program count as
    one. (The former per-(instance, level) msm dispatch loop made batching
    LOSE to sequential proving — round-4 measurement.)
    Returns list of (eval:int, OpenProof)."""
    from spartan_tpu.commitment import scheme as _scheme

    nv = pp.nv
    nb = len(polys)
    if pp.powers_of_h_comb is None:
        raise invalid_arg("batched open requires combined opening bases")
    eval_devs = []
    qcats = []
    for poly, point in zip(polys, points):
        if len(point) != nv:
            raise invalid_arg("point dimension mismatch")
        point_mont = fo.encode_mont(FR, point)
        qcat, ev = _scheme._quotients_and_eval(poly, point_mont)
        eval_devs.append(ev)
        qcats.append(qcat)

    sizes_per = [1 << (nv - 1 - i) for i in range(nv)]
    offs = [0] * nv
    for i in range(1, nv):
        offs[i] = offs[i - 1] + sizes_per[i - 1]

    max_lanes = 1 << 21
    device_results = [[None] * nv for _ in range(nb)]

    def _flush(group, c):
        if not group:
            return
        cat = lambda arrs: jnp.concatenate(arrs, axis=-1)
        bases = jax.tree_util.tree_map(
            lambda *leaves: cat(list(leaves)),
            *[pp.powers_of_h_comb[i] for (_j, i) in group],
        )
        scalars = jnp.concatenate(
            [qcats[j][:, offs[i] : offs[i] + sizes_per[i]] for (j, i) in group],
            axis=1,
        )
        res = msm_mod.msm_many(
            bases, tuple(sizes_per[i] for (_j, i) in group), scalars, "fp2", c
        )
        for slot, (j, i) in enumerate(group):
            device_results[j][i] = jax.tree_util.tree_map(
                lambda a: a[..., slot : slot + 1], res
            )

    for c, levels in ((8, [i for i in range(nv) if sizes_per[i] >= 512]),
                      (4, [i for i in range(nv) if sizes_per[i] < 512])):
        nw = 256 // c
        group: list = []
        budget = 0
        for j in range(nb):
            for i in levels:
                lanes = nw * sizes_per[i]
                if lanes > max_lanes:
                    device_results[j][i] = msm_mod.msm(
                        pp.powers_of_h_comb[i],
                        qcats[j][:, offs[i] : offs[i] + sizes_per[i]],
                        "fp2",
                    )
                    continue
                if group and budget + lanes > max_lanes:
                    _flush(group, c)
                    group, budget = [], 0
                group.append((j, i))
                budget += lanes
        _flush(group, c)

    evals = fo.decode_ints(FR, jnp.concatenate(eval_devs, axis=1))  # fetch 1
    proofs_flat = cv.g2_decode_many(
        [device_results[j][i] for j in range(nb) for i in range(nv)]
    )  # fetch 2
    out = []
    for j in range(nb):
        out.append(
            (evals[j], OpenProof(h=pp.h, proofs=proofs_flat[j * nv : (j + 1) * nv]))
        )
    return out


# ---------------------------------------------------------------------------
# Batched NI prover driver
# ---------------------------------------------------------------------------


def prove_many(
    pk: IndexPK, instances: List[Tuple[List[int], List[int]]], pp: PublicParameter
) -> List[Proof]:
    """Prove B same-circuit instances with shared batched dispatches.

    Produces proofs bit-identical to per-instance MLArgumentForR1CS.prove
    (each instance has its own Fiat–Shamir transcript). All instances must
    share the circuit (pk) and public-input length."""
    if not instances:
        return []
    bsz = len(instances)
    log_n = pk.log_n
    n = 1 << log_n
    log_v = len(instances[0][0]).bit_length() - 1
    if any(len(v) != 1 << log_v for v, _ in instances):
        raise invalid_arg("all instances must share the public-input length")

    fss, zs = [], []
    for v, w in instances:
        if len(v) + len(w) != n:
            raise invalid_arg("|v| + |w| != number of variables")
        # each instance has its own transcript; the matrices are fed as
        # separate absorptions, exactly like prove (reference src/lib.rs:61-65)
        fs = Blake2sRng.setup()
        fs.feed(pk.matrix_a.serialize())
        fs.feed(pk.matrix_b.serialize())
        fs.feed(pk.matrix_c.serialize())
        fs.feed(ser.ser_fr_vec(v))
        fss.append(fs)
        zs.append(fo.encode_mont(FR, list(v) + list(w)))

    # round 1: all commits, one fetch
    with span("Batch Prove 1: commits"):
        pm1s = [
            pr.ProverFirstMessage(commitment=c) for c in commit_many(pp, zs)
        ]
    r_vs = []
    for fs, pm1 in zip(fss, pm1s):
        fs.feed(pm1.serialize())
        r_vs.append(fs.sample_fr_vec(log_v))

    # round 2: all opens at (r_v || 0..), two fetches
    with span("Batch Prove 2: opens z(r_v,0..)"):
        pts = [list(rv) + [0] * (log_n - log_v) for rv in r_vs]
        opens = open_many(pp, zs, pts)
    tors = []
    pm2s = []
    for fs, (ev, prf) in zip(fss, opens):
        pm2 = pr.ProverSecondMessage(z_rv_0=ev, proof_for_z_rv_0=prf)
        pm2s.append(pm2)
        fs.feed(pm2.serialize())
        tors.append(fs.sample_fr_vec(log_n))

    # round 3: batched sparse mat-vec (one dispatch per matrix for the batch)
    with span("Batch Prove 3: sparse mat-vec"):
        z_b = jnp.stack(zs, axis=1)  # (16, B, n)
        az = sum_over_y_b(pk.matrix_a.coo, z_b, n)
        bz = sum_over_y_b(pk.matrix_b.coo, z_b, n)
        cz = sum_over_y_b(pk.matrix_c.coo, z_b, n)
    info1 = sc.IndexInfo(max_multiplicands=log_n + 2, num_variables=log_n)
    pm3 = pr.ProverThirdMessage(ml_index_info=info1)
    for fs in fss:
        fs.feed(pm3.serialize())

    # sumcheck 1 + round 4: one dispatch, one fetch for the whole batch
    with span("Batch Prove SC1 (fused)"):
        tor_mont = jnp.stack([fo.encode_mont(FR, t) for t in tors], axis=1)
        state_b = jnp.stack([fsd.state_to_words(fs.get_state()) for fs in fss])
        ev1, rs1, vabc, rabc, state_b = jax.device_get(
            sc1_phase_b(az, bz, cz, tor_mont, state_b)
        )
    sc1_msgs_b, pm4s, r_xs, rabcs = [], [], [], []
    for b in range(bsz):
        fss[b].set_state(fsd.words_to_state(state_b[b]))
        sc1_msgs_b.append(
            [sc.ProverMsg(evaluations=FR.dec(ev1[i][:, b, :])) for i in range(log_n)]
        )
        r_xs.append(FR.dec(rs1[:, b, :]))
        va, vb, vc = FR.dec(vabc[:, b, :])
        pm4s.append(pr.ProverFourthMessage(va=va, vb=vb, vc=vc))
        rabcs.append(FR.dec(rabc[:, b, :]))

    # round 5: batched eval_on_x + combine
    with span("Batch Prove 5: eval_on_x + combine"):
        rx_mont = jnp.stack([fo.encode_mont(FR, rx) for rx in r_xs], axis=1)
        eqx = eq_table_b(rx_mont)  # (16, B, n)
        arx = eval_on_x_table_b(pk.matrix_a.coo, eqx, n)
        brx = eval_on_x_table_b(pk.matrix_b.coo, eqx, n)
        crx = eval_on_x_table_b(pk.matrix_c.coo, eqx, n)
        ra_m = jnp.stack(
            [fo.encode_mont(FR, [rabcs[b][0]]) for b in range(bsz)], axis=1
        )  # (16, B, 1)
        rb_m = jnp.stack(
            [fo.encode_mont(FR, [rabcs[b][1]]) for b in range(bsz)], axis=1
        )
        rc_m = jnp.stack(
            [fo.encode_mont(FR, [rabcs[b][2]]) for b in range(bsz)], axis=1
        )
        w_b = fo.mont_mul(FR, arx, ra_m)
        w_b = fo.add(FR, w_b, fo.mont_mul(FR, brx, rb_m))
        w_b = fo.add(FR, w_b, fo.mont_mul(FR, crx, rc_m))
    info2 = sc.IndexInfo(max_multiplicands=2, num_variables=log_n)
    pm5 = pr.ProverFifthMessage(index_info=info2)
    for fs in fss:
        fs.feed(pm5.serialize())

    # sumcheck 2: one dispatch, one fetch
    with span("Batch Prove SC2 (fused)"):
        state_b = jnp.stack([fsd.state_to_words(fs.get_state()) for fs in fss])
        ev2, rs2, state_b = jax.device_get(sc2_phase_b(w_b, z_b, state_b))
    sc2_msgs_b, r_ys = [], []
    for b in range(bsz):
        fss[b].set_state(fsd.words_to_state(state_b[b]))
        sc2_msgs_b.append(
            [sc.ProverMsg(evaluations=FR.dec(ev2[i][:, b, :])) for i in range(log_n)]
        )
        r_ys.append(FR.dec(rs2[:, b, :]))

    # round 6: all final opens, two fetches
    with span("Batch Prove 6: opens z(r_y)"):
        opens6 = open_many(pp, zs, r_ys)
    proofs = []
    for b in range(bsz):
        ev, prf = opens6[b]
        pm6 = pr.ProverSixthMessage(z_ry=ev, proof_for_z_ry=prf)
        proofs.append(
            Proof(
                prover_first_message=pm1s[b],
                prover_second_message=pm2s[b],
                prover_third_message=pm3,
                first_sumcheck_messages=sc1_msgs_b[b],
                prover_fourth_message=pm4s[b],
                prover_fifth_message=pm5,
                second_sumcheck_messages=sc2_msgs_b[b],
                prover_sixth_message=pm6,
            )
        )
    return proofs


# ---------------------------------------------------------------------------
# Sequential convenience API (formerly protocol/batch.py): per-instance loop.
# Correct but latency-bound; prove_many above is the batched fast path.
# ---------------------------------------------------------------------------


def prove_batch(
    pk: IndexPK, instances: List[Tuple[List[int], List[int]]], pp: PublicParameter
) -> List[Proof]:
    """Prove all (v, w) instances one at a time; returns one Proof each."""
    from spartan_tpu.protocol.argument import MLArgumentForR1CS

    return [MLArgumentForR1CS.prove(pk, v, w, pp) for v, w in instances]


def verify_batch(vk, instances, proofs, vp) -> List[bool]:
    from spartan_tpu.protocol.argument import MLArgumentForR1CS

    return [
        MLArgumentForR1CS.verify(vk, v, proof, vp)
        for (v, _w), proof in zip(instances, proofs)
    ]
