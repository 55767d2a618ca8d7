"""Device-resident sumcheck phases built from few small programs.

The reference's NI driver alternates prover rounds with Fiat–Shamir sampling
on the host (src/lib.rs:91-103, 119-131) — that structure forces a host
round-trip per round, which on a remote TPU costs more than the round's
arithmetic. Here the transcript itself runs on device (ops/fs_device.py,
ops/blake2s.py): challenges stay in device arrays between rounds, so the
whole phase — fold, evaluate, serialize, absorb, sample, repeat — executes
without a single host sync; only the final messages and challenges return.

Program-shape design (rounds 2-3 lessons — BOTH costs matter):
- compile cost: a single program unrolling all log_n rounds was multi-MB HLO
  and took tens of minutes to build cold;
- dispatch cost: one program per round costs ~2 log_n dispatches, and on a
  remote TPU tunnel each dispatch carries ~10-30 ms latency, which dominated
  the warm prove wall time.

The split that minimizes both:
- the few LARGE rounds (tables wider than TAIL_W) run as per-width *step*
  programs (ops/sumcheck.sc1_round / prod2_round — shared across proof
  sizes; a new size compiles exactly one new step per phase) plus a tiny
  per-degree *emit* program;
- every remaining round runs in ONE fixed-width lax.scan program
  (_sc1_tail_phase / _sc2_tail_phase): tables zero-padded to TAIL_W, the
  body (fold + inner evals + wire extension + Blake2s absorb + sample)
  traced once, sumcheck-1's scan also absorbing prover round 4 (va/vb/vc +
  r_a/r_b/r_c — reference src/ahp/prover.rs:210-228). Zero is a fixed point
  of fold/add/mul and pad lanes carry zero weight, so emitted bytes are
  bit-identical to the per-round path.

A 2^14 proof thus runs sumcheck 1 in ~6 dispatches instead of ~28.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.host import field as hf
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import fs_device as fsd
from spartan_tpu.ops import mle
from spartan_tpu.ops import sumcheck as sck
from spartan_tpu.ops.field import FR


def _ell_at_r(tor_i, r):
    """l_i(r) for a traced Montgomery challenge r: 2 tor_i r - tor_i - r + 1."""
    t2 = fo.mont_mul(FR, tor_i, r)
    out = fo.add(FR, t2, t2)
    out = fo.sub(FR, out, tor_i)
    out = fo.sub(FR, out, r)
    return fo.add(FR, out, fo.ones_mont(FR, (1,)))


def _feed_fr_vec(state, limbs):
    """Absorb ser_fr_vec(values): u64 length prefix + 32B LE per element.

    limbs: (16, n) canonical."""
    n = limbs.shape[1]
    prefix = jnp.asarray([n, 0], dtype=jnp.uint32)
    words = jnp.concatenate(
        [prefix, fsd.limbs_to_words(limbs).reshape(-1)], axis=0
    )
    return fsd.fs_feed(state, words)


def _sample_mont(state, counter):
    """One Fr sample: returns (canonical (16,1), Montgomery (16,1), counter)."""
    r, counter = fsd.fs_sample_fr(state, counter)
    r = r.reshape(16, 1)
    return r, fo.to_mont(FR, r), counter


_EMIT_CONSTS: dict = {}


def _emit_consts(deg: int):
    """Host-precomputed Montgomery constant rows for one emit program.

    For t = 0..deg (the wire's evaluation points, reference sumcheck message
    format): Lagrange coefficients through (0,q0),(1,q1),(2,q2)

        c0(t) = (t-1)(t-2)/2,  c1(t) = -t(t-2),  c2(t) = t(t-1)/2

    (exact at t = 0,1,2: they reduce to selecting q0/q1/q2) and the linear
    eq-factor pieces l_i(t) = tor_i*(2t-1) + (1-t):

        ellA(t) = 2t-1,  ellB(t) = 1-t.

    Returns five (16, deg+1) Montgomery arrays, cached per deg.
    """
    out = _EMIT_CONSTS.get(deg)
    if out is None:
        inv2 = hf.fr_inv(2)
        ts = range(deg + 1)
        c0 = [((t - 1) * (t - 2)) % hf.R * inv2 % hf.R for t in ts]
        c1 = [(-t * (t - 2)) % hf.R for t in ts]
        c2 = [(t * (t - 1)) % hf.R * inv2 % hf.R for t in ts]
        ea = [(2 * t - 1) % hf.R for t in ts]
        eb = [(1 - t) % hf.R for t in ts]
        out = tuple(fo.encode_mont(FR, v) for v in (c0, c1, c2, ea, eb))
        _EMIT_CONSTS[deg] = out
    return out


def _sc1_emit_core(q, tor_i, pre, state, c0, c1, c2, ea, eb):
    """Extend q(0),q(1),q(2) to the deg+1 wire evals, absorb, sample.

    q: (16, 3) Montgomery inner-quadratic values. tor_i/pre: (16, 1)
    Montgomery. state: (8,) transcript words. c*/e*: _emit_consts rows.

    Returns (ev (16, deg+1) canonical, r (16, 1) canonical, r_mont (16, 1),
    pre' = pre * l_i(r), state').
    """
    q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    qt = fo.add(
        FR,
        fo.mont_mul(FR, q0, c0),
        fo.add(FR, fo.mont_mul(FR, q1, c1), fo.mont_mul(FR, q2, c2)),
    )  # (16, deg+1)
    ell = fo.add(FR, fo.mont_mul(FR, tor_i, ea), eb)
    ev = fo.from_mont(FR, fo.mont_mul(FR, pre, fo.mont_mul(FR, ell, qt)))
    state = _feed_fr_vec(state, ev)
    r, r_mont, _ = _sample_mont(state, jnp.uint32(0))
    pre2 = fo.mont_mul(FR, pre, _ell_at_r(tor_i, r_mont))
    return ev, r, r_mont, pre2, state


_sc1_emit = jax.jit(_sc1_emit_core)


def _sc1_final_core(az, bz, cz, r_mont, state):
    """Round 4 on device: final fold -> va,vb,vc; absorb; sample r_a,r_b,r_c.

    az/bz/cz: (16, 2) Montgomery (post last sumcheck round).
    """
    az = mle.fold(az, r_mont)
    bz = mle.fold(bz, r_mont)
    cz = mle.fold(cz, r_mont)
    vabc = fo.from_mont(FR, jnp.concatenate([az, bz, cz], axis=1))  # (16, 3)
    words = fsd.limbs_to_words(vabc).reshape(-1)  # 3 x ser_fr, no prefix
    state = fsd.fs_feed(state, words)
    ra, _, ctr = _sample_mont(state, jnp.uint32(0))
    rb, _, ctr = _sample_mont(state, ctr)
    rc, _, _ = _sample_mont(state, ctr)
    return vabc, jnp.concatenate([ra, rb, rc], axis=1), state


def _sc2_emit_core(q, state):
    """Absorb a degree-2 round's 3 evals, sample the challenge."""
    ev = fo.from_mont(FR, q)  # (16, 3)
    state = _feed_fr_vec(state, ev)
    r, r_mont, _ = _sample_mont(state, jnp.uint32(0))
    return ev, r, r_mont, state


_sc2_emit = jax.jit(_sc2_emit_core)


@jax.jit
def _sc1_tail_phase(az, bz, cz, suffix_tail: Tuple, tor_tail, pre, r_mont,
                    state, c0, c1, c2, ea, eb):
    """All tail rounds of sumcheck 1 + round 4, in ONE scan program.

    az/bz/cz: (16, <=TAIL_W) tables entering the first tail round (pre-fold).
    suffix_tail: tuple of the remaining eq suffix tables. tor_tail: (16, T).
    pre/r_mont: carried from the last large round. Returns (evals
    (T, 16, deg+1), rs (T, 16, 1), vabc (16,3), rabc (16,3), state').
    """
    w = sck.TAIL_W
    az = sck.pad_cols(az, w)
    bz = sck.pad_cols(bz, w)
    cz = sck.pad_cols(cz, w)
    s_stack = jnp.stack([sck.pad_cols(s, w // 4) for s in suffix_tail])
    tor_xs = jnp.moveaxis(tor_tail, 1, 0)[:, :, None]  # (T, 16, 1)

    def body(carry, xs):
        az, bz, cz, pre, r_mont, state = carry
        s, tor_i = xs
        az = mle.fold(az, r_mont)
        bz = mle.fold(bz, r_mont)
        cz = mle.fold(cz, r_mont)
        q = sck.sc1_evals3(az, bz, cz, s)
        ev, r, r_mont, pre, state = _sc1_emit_core(
            q, tor_i, pre, state, c0, c1, c2, ea, eb
        )
        repad = lambda t: jnp.concatenate([t, jnp.zeros_like(t)], axis=-1)
        return (repad(az), repad(bz), repad(cz), pre, r_mont, state), (ev, r)

    (az, bz, cz, _pre, r_mont, state), (evs, rs) = jax.lax.scan(
        body, (az, bz, cz, pre, r_mont, state), (s_stack, tor_xs)
    )
    vabc, rabc, state = _sc1_final_core(
        az[:, :2], bz[:, :2], cz[:, :2], r_mont, state
    )
    return evs, rs, vabc, rabc, state


@jax.jit
def _sc2_tail_phase(w_tab, z_tab, r_mont, state):
    """All tail rounds of sumcheck 2 in ONE scan program."""
    w = sck.TAIL_W
    n = w_tab.shape[1]
    # entering width 2^k -> k-1 rounds remain (the last round folds to
    # logical width 2 and evaluates over one pair)
    t_rounds = n.bit_length() - 2
    w_tab = sck.pad_cols(w_tab, w)
    z_tab = sck.pad_cols(z_tab, w)

    def body(carry, _):
        w_tab, z_tab, r_mont, state = carry
        w_tab = mle.fold(w_tab, r_mont)
        z_tab = mle.fold(z_tab, r_mont)
        q = sck.prod2_evals3(w_tab, z_tab)
        ev, r, r_mont, state = _sc2_emit_core(q, state)
        repad = lambda t: jnp.concatenate([t, jnp.zeros_like(t)], axis=-1)
        return (repad(w_tab), repad(z_tab), r_mont, state), (ev, r)

    (w_tab, z_tab, r_mont, state), (evs, rs) = jax.lax.scan(
        body, (w_tab, z_tab, r_mont, state), None, length=t_rounds
    )
    return evs, rs, state


def _tail_start(log_n: int) -> int:
    """First round index whose ENTERING table width fits TAIL_W (round 0
    always runs as a per-width program — it takes no fold)."""
    return max(1, log_n - (sck.TAIL_W.bit_length() - 1) + 1)


def sc1_phase(az, bz, cz, suffix: Tuple, tor_mont, state):
    """Sumcheck 1 + round 4, device-resident transcript.

    az/bz/cz: (16, n) Montgomery tables. suffix: tuple of eq suffix tables of
    tor (mle.eq_suffix_tables). tor_mont: (16, log_n). state: (8,) transcript
    words (post-feed of the third prover message).

    Returns (evals (log_n, 16, deg+1) canonical, rs (16, log_n) canonical —
    the log_n sampled challenges (r_1..r_{log_n-1}, last_random_point),
    vabc (16, 3) canonical, rabc (16, 3) canonical, state' (8,)).
    """
    log_n = tor_mont.shape[1]
    deg = log_n + 2
    consts = _emit_consts(deg)
    i0 = _tail_start(log_n)

    pre = fo.ones_mont(FR, (1,))
    r_mont = fo.encode_mont(FR, [0])  # dummy for the no-fold first round
    evals_out, rs_out = [], []
    for i in range(i0):
        q, az, bz, cz = sck.sc1_round(
            az, bz, cz, suffix[i + 1], i > 0, r_mont
        )
        ev, r, r_mont, pre, state = _sc1_emit(
            q, tor_mont[:, i : i + 1], pre, state, *consts
        )
        evals_out.append(ev)
        rs_out.append(r)

    if i0 == log_n:  # no tail rounds (log_n == 1): straight to round 4
        vabc, rabc, state = jax.jit(_sc1_final_core)(
            az[:, :2], bz[:, :2], cz[:, :2], r_mont, state
        )
        return (
            jnp.stack(evals_out, axis=0),
            jnp.concatenate(rs_out, axis=1),
            vabc, rabc, state,
        )

    evs, rs, vabc, rabc, state = _sc1_tail_phase(
        az, bz, cz, tuple(suffix[i0 + 1 :]), tor_mont[:, i0:], pre, r_mont,
        state, *consts,
    )
    evals = jnp.concatenate([jnp.stack(evals_out, axis=0), evs], axis=0)
    rs_all = jnp.concatenate(rs_out + [jnp.moveaxis(rs, 0, 2).reshape(16, -1)], axis=1)
    return evals, rs_all, vabc, rabc, state


def sc2_phase(w, z, state):
    """Sumcheck 2, device-resident transcript.

    Returns (evals (log_n, 16, 3) canonical, rs (16, log_n) canonical
    (r_1..r_{log_n-1}, last_random_point), state' (8,)).
    """
    n = int(w.shape[1])
    log_n = n.bit_length() - 1
    i0 = _tail_start(log_n)
    r_mont = fo.encode_mont(FR, [0])
    evals_out, rs_out = [], []
    for i in range(i0):
        q, w, z = sck.prod2_round(w, z, i > 0, r_mont)
        ev, r, r_mont, state = _sc2_emit(q, state)
        evals_out.append(ev)
        rs_out.append(r)
    if i0 == log_n:  # no tail rounds (log_n == 1)
        return (
            jnp.stack(evals_out, axis=0),
            jnp.concatenate(rs_out, axis=1),
            state,
        )
    evs, rs, state = _sc2_tail_phase(w, z, r_mont, state)
    evals = jnp.concatenate([jnp.stack(evals_out, axis=0), evs], axis=0)
    rs_all = jnp.concatenate(rs_out + [jnp.moveaxis(rs, 0, 2).reshape(16, -1)], axis=1)
    return evals, rs_all, state
