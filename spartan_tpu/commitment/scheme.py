"""PST/Libra-style multilinear polynomial commitment: keygen/commit/open/verify.

TPU-native rebuild of reference src/commitment/{setup,commit,open,verify}.rs:

- keygen (setup.rs:27-104): sample generators g, h and trapdoor t; build the
  evaluation hypercubes powers_of_g[i][b] = g^{eq(t[i..], b)} (and same in
  G2). The reference chains suffix eq-products + a windowed FixedBaseMSM; here
  the eq tables come from the batched MLE kernel and the exponentiations from
  the windowed fixed-base MSM kernel (one fused scan, all levels at once).
  Returns (pp, vp, t) — the trapdoor is returned to the caller exactly like
  the reference (a documented quirk, SURVEY.md §7).
- commit (commit.rs:17-29): one 2^nv-point G1 Pippenger MSM of the
  evaluation table.
- open (open.rs:19-58): per-variable quotient tables q[k][b] =
  r[k][2b+1]-r[k][2b] with the folded remainder (= the MLE fold kernel), each
  committed with a G2 MSM over powers_of_h[i] with duplicated scalars.
- verify (verify.rs:12-45): host-side pairing product
  e(com * g^-eval, h) == prod_i e(g^{t_i - point_i}, proof_i).
"""

from __future__ import annotations

import random
from typing import List, Tuple

import jax
import jax.numpy as jnp

from spartan_tpu.host import field as hf
from spartan_tpu.host import curve as hc
from spartan_tpu.host import pairing as hp
from spartan_tpu.ops import curve as cv
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import fp2
from spartan_tpu.ops import mle
from spartan_tpu.ops import msm as msm_mod
from spartan_tpu.ops.field import FP, FR
from spartan_tpu.commitment.data_structures import (
    Commitment,
    OpenProof,
    PublicParameter,
    VerifierParameter,
)
from spartan_tpu.utils.errors import invalid_arg
from spartan_tpu.utils.timers import span


def _normalize_g1(batch: cv.PointBatch) -> cv.PointBatch:
    """Jacobian -> affine-encoded (Z=1, or Z=0 for infinity) G1 batch."""
    f = cv.G1_FIELD
    x, y, inf = cv.normalize(f, lambda z: fo.inv(FP, z), batch)
    one = fo.ones_mont(FP, (x.shape[1],))
    z = jnp.where(inf[None, :], jnp.zeros_like(one), one)
    x = jnp.where(inf[None, :], jnp.zeros_like(x), x)
    y = jnp.where(inf[None, :], jnp.zeros_like(y), y)
    return cv.PointBatch(x, y, z)


def _normalize_g2(batch: cv.PointBatch) -> cv.PointBatch:
    f = cv.G2_FIELD
    x, y, inf = cv.normalize(f, fp2.inv2, batch)
    n = x[0].shape[1]
    one = fo.ones_mont(FP, (n,))
    zero = fo.zeros(FP, (n,))
    m = inf[None, :]
    z = (jnp.where(m, zero, one), zero)
    x = (jnp.where(m, zero, x[0]), jnp.where(m, zero, x[1]))
    y = (jnp.where(m, zero, y[0]), jnp.where(m, zero, y[1]))
    return cv.PointBatch(x, y, z)


def _combine_pairs_g2(pb: cv.PointBatch) -> cv.PointBatch:
    """comb[j] = P[2j] + P[2j+1] (Jacobian) for opening-MSM base halving."""

    def split(a):
        k, n = a.shape
        pr = a.reshape(k, n // 2, 2)
        return pr[:, :, 0], pr[:, :, 1]

    ex0, ox0 = split(pb.x[0]); ex1, ox1 = split(pb.x[1])
    ey0, oy0 = split(pb.y[0]); ey1, oy1 = split(pb.y[1])
    ez0, oz0 = split(pb.z[0]); ez1, oz1 = split(pb.z[1])
    even = cv.PointBatch((ex0, ex1), (ey0, ey1), (ez0, ez1))
    odd = cv.PointBatch((ox0, ox1), (oy0, oy1), (oz0, oz1))
    return cv.add(cv.G2_FIELD, even, odd)


def keygen(nv: int, rng) -> Tuple[PublicParameter, VerifierParameter, List[int]]:
    """Trusted setup. rng must provide sample_fr() (FS RNG or test RNG)."""
    if nv <= 0:
        raise invalid_arg("nv must be positive")
    g = hc.G1.mul(hf.G1_GEN, rng.sample_fr())
    h = hc.G2.mul(hf.G2_GEN, rng.sample_fr())
    t = [rng.sample_fr() for _ in range(nv)]

    # scalars for all levels: eq(t[i..], b) over b in {0,1}^(nv-i), i = 0..nv-1
    with span("keygen eq tables"):
        suffix = mle.eq_suffix_tables(t)  # S[j] = eq table of t[j:]
        all_scalars = jnp.concatenate(
            [fo.from_mont(FR, suffix[i]) for i in range(nv)], axis=1
        )  # canonical, total 2^(nv+1) - 2 scalars

    with span("keygen fixed-base exps"):
        # window tables built on device (8 batched adds) — the host
        # contributes only 256 doublings (ops/msm.fixed_base_table_device;
        # replaces the former per-point host loop, the dominant keygen cost)
        g_table = _normalize_g1(
            msm_mod.fixed_base_table_device(g, hc.G1, cv.g1_encode, "fp")
        )
        h_table = _normalize_g2(
            msm_mod.fixed_base_table_device(h, hc.G2, cv.g2_encode, "fp2")
        )
        pp_g = _normalize_g1(msm_mod.fixed_base_msm(g_table, all_scalars, "fp"))
        pp_h = _normalize_g2(msm_mod.fixed_base_msm(h_table, all_scalars, "fp2"))

    powers_of_g, powers_of_h = [], []
    start = 0
    for i in range(nv):
        size = 1 << (nv - i)
        take = lambda a: a[..., start : start + size]
        powers_of_g.append(cv.PointBatch(*[jnp.asarray(take(c)) for c in pp_g]))
        powers_of_h.append(
            cv.PointBatch(
                (take(pp_h.x[0]), take(pp_h.x[1])),
                (take(pp_h.y[0]), take(pp_h.y[1])),
                (take(pp_h.z[0]), take(pp_h.z[1])),
            )
        )
        start += size

    with span("keygen vp masks"):
        g_mask = [hc.G1.mul(g, ti) for ti in t]

    with span("keygen combined opening bases"):
        # combined pairs come out Jacobian; normalize so the opening MSM's
        # bucket walk can use mixed (affine-base) adds. One batched inverse
        # over the concatenation of every level.
        combs = [_combine_pairs_g2(pb) for pb in powers_of_h]
        cat = jax.tree_util.tree_map(
            lambda *ls: jnp.concatenate(list(ls), axis=-1), *combs
        )
        catn = _normalize_g2(cat)
        powers_of_h_comb = []
        off = 0
        for pb in combs:
            size = pb.x[0].shape[-1]
            powers_of_h_comb.append(
                jax.tree_util.tree_map(lambda a: a[..., off : off + size], catn)
            )
            off += size

    pp = PublicParameter(
        nv=nv, powers_of_g=powers_of_g, powers_of_h=powers_of_h, g=g, h=h,
        powers_of_h_comb=powers_of_h_comb,
    )
    vp = VerifierParameter(nv=nv, g=g, h=h, g_mask_random=g_mask)
    return pp, vp, t


def commit(pp: PublicParameter, poly) -> Commitment:
    """poly: (16, 2^nv) Montgomery Fr table. One G1 Pippenger MSM."""
    nv = int(poly.shape[1]).bit_length() - 1
    if 1 << nv != poly.shape[1]:
        raise invalid_arg("polynomial table must be power-of-two sized")
    if nv != pp.nv:
        raise invalid_arg("polynomial nv mismatch with public parameter")
    scalars = fo.from_mont(FR, poly)  # into_repr (commit.rs:21)
    with span("commit MSM"):
        res = msm_mod.msm(pp.powers_of_g[0], scalars, "fp")
    g_product = cv.g1_decode(res)[0]
    return Commitment(nv=nv, g_product=g_product)


@jax.jit
def _quotients_and_eval(poly, point_mont):
    """All PST quotient tables + the evaluation, in ONE program per size.

    The reference computes the per-variable quotient table and the folded
    remainder together from the same even/odd split (open.rs:42-45); this
    runs that whole ladder — and the evaluation, which is the final fold —
    as one dispatch, so an opening issues one program instead of ~4 small
    per-width programs per level.

    poly: (16, 2^nv) Montgomery; point_mont: (16, nv).
    Returns (qcat: (16, 2^nv - 1) CANONICAL scalars, levels concatenated
    largest-first — exactly the layout ops/msm.msm_many consumes; eval:
    (16, 1) canonical).
    """
    k = poly.shape[0]
    nv = int(poly.shape[1]).bit_length() - 1
    r = poly
    outs = []
    for i in range(nv):
        pairs = r.reshape(k, r.shape[1] // 2, 2)
        even, odd = pairs[:, :, 0], pairs[:, :, 1]
        q = fo.sub(FR, odd, even)  # quotient table, size 2^(nv-1-i)
        outs.append(fo.from_mont(FR, q))
        # fold = even + p_i * (odd - even) = even + p_i * q
        r = fo.add(FR, even, fo.mont_mul(FR, q, point_mont[:, i : i + 1]))
    return jnp.concatenate(outs, axis=1), fo.from_mont(FR, r)


def banded_g2_msms(bases_list, scalars_list, sizes):
    """Run the per-level opening MSMs as few fused programs as possible.

    Fuses the per-level MSMs into as few composite programs as the lane
    budget allows (ops/msm.msm_many): the whole opening then costs about
    one commit-sized MSM instead of nv sequential ones (the reference runs
    them serially, src/commitment/open.rs:37-51). Oversized levels (beyond
    the lane budget) run individually via msm's window chunking.

    Window size per level: c=8 (32 windows) for big levels — the
    signed-digit pair-tree reduction keeps the ~3*2^(c-1)-adds-per-window
    reduce affordable and halves the dominant walk adds — but the reduce
    cost is PER LEVEL, so the many small tail levels pay 32*384 lane-adds
    each for a handful of points. They run in a separate c=4 program (64
    windows, 24 reduce adds per window) where their bucket occupancy also
    stays dense enough for the strided walk instead of the full-add
    segmented scan (measured: the tail band was ~25% of the opening MSM at
    2^14). Shared by the single-device and mesh-sharded opens so both
    compile the SAME msm_many programs.

    Returns a list of single-point device results, one per level.
    """
    n_levels = len(sizes)
    max_lanes = 1 << 21
    device_results = [None] * n_levels

    def _flush(group, c):
        if not group:
            return
        idxs = [g for g in group]
        cat = lambda arrs: jnp.concatenate(arrs, axis=-1)
        bases = jax.tree_util.tree_map(
            lambda *leaves: cat(list(leaves)), *[bases_list[g] for g in idxs]
        )
        scalars = jnp.concatenate([scalars_list[g] for g in idxs], axis=1)
        res = msm_mod.msm_many(
            bases, tuple(sizes[g] for g in idxs), scalars, "fp2", c
        )
        for j, g in enumerate(idxs):
            device_results[g] = jax.tree_util.tree_map(
                lambda a: a[..., j : j + 1], res
            )

    for c, levels in ((8, [i for i in range(n_levels) if sizes[i] >= 512]),
                      (4, [i for i in range(n_levels) if sizes[i] < 512])):
        nw = 256 // c
        group: list = []
        budget = 0
        for i in levels:
            if nw * sizes[i] > max_lanes:
                device_results[i] = msm_mod.msm(
                    bases_list[i], scalars_list[i], "fp2"
                )
                continue
            if group and budget + nw * sizes[i] > max_lanes:
                _flush(group, c)
                group, budget = [], 0
            group.append(i)
            budget += nw * sizes[i]
        _flush(group, c)
    return device_results


def open_poly(pp: PublicParameter, poly, point: List[int]):
    """Evaluate poly at point and produce the PST opening proof.

    point: list of nv host ints. Returns (eval:int, OpenProof, q_tables)
    — q_tables returned like the reference's third tuple element
    (open.rs:19-58, used by its sanity tests; canonical-form slices here).
    """
    nv = pp.nv
    if len(point) != nv:
        raise invalid_arg("point dimension mismatch")
    point_mont = fo.encode_mont(FR, point)
    with span("open quotients + eval"):
        qcat, ev_limbs = _quotients_and_eval(poly, point_mont)

    q_tables = []
    sizes, scalars_list, bases_list = [], [], []
    with span("open G2 MSMs"):
        off = 0
        for i in range(nv):
            m = 1 << (nv - 1 - i)
            q = qcat[:, off : off + m]
            off += m
            q_tables.append(q)
            if pp.powers_of_h_comb is not None:
                # MSM over pairwise-combined bases == the reference's
                # duplicated-scalar MSM (open.rs:46-48) at half the points.
                scalars_list.append(q)
                bases_list.append(pp.powers_of_h_comb[i])
            else:
                scalars_list.append(jnp.repeat(q, 2, axis=1))
                bases_list.append(pp.powers_of_h[i])
            sizes.append(scalars_list[-1].shape[1])

        device_results = banded_g2_msms(bases_list, scalars_list, sizes)
        proofs = cv.g2_decode_many(device_results)  # one host fetch for all levels

    eval_res = fo.decode_ints(FR, ev_limbs)[0]
    return eval_res, OpenProof(h=pp.h, proofs=proofs), q_tables


def verify(
    vp: VerifierParameter,
    commitment: Commitment,
    point: List[int],
    evaluation: int,
    proof: OpenProof,
) -> bool:
    """Host-side pairing-product check (verify.rs:12-45)."""
    with span("PC verify pairings"):
        # com * g^{-eval} and g_mask_i * g^{-point_i} as 2-term lincombs
        # (native Jacobian path; verify.rs:14,21-24 uses a FixedBaseMSM here)
        left_pt = hc.g1_lincomb(
            [commitment.g_product, vp.g], [1, hf.R - evaluation % hf.R]
        )
        left = hp.pairing(left_pt, vp.h)
        pairs = []
        for i in range(vp.nv):
            lhs = hc.g1_lincomb(
                [vp.g_mask_random[i], vp.g], [1, hf.R - point[i] % hf.R]
            )
            pairs.append((lhs, proof.proofs[i]))
        right = hp.product_of_pairings(pairs)
    return left == right
