"""Device-resident sumcheck phases built from small per-round programs.

The reference's NI driver alternates prover rounds with Fiat–Shamir sampling
on the host (src/lib.rs:91-103, 119-131) — that structure forces a host
round-trip per round, which on a remote TPU costs more than the round's
arithmetic. Here the transcript itself runs on device (ops/fs_device.py,
ops/blake2s.py): challenges stay in device arrays between rounds, so the
whole phase — fold, evaluate, serialize, absorb, sample, repeat — executes
without a single host sync; only the final messages and challenges return.

Compile-cost design (the round-2 lesson): a single fused program unrolling
all log_n rounds produced multi-MB HLO and 20-minute cold compiles. Instead
each phase is a host Python loop over TWO small jitted programs per round:

  - a *step* program (ops/sumcheck.sc1_round / prod2_round): fold by the
    previous challenge + inner evaluations. Keyed by table width only, so a
    prove at 2^k reuses every step program already compiled for smaller
    sizes; a NEW size compiles exactly one new step per phase.
  - an *emit* program (_sc1_emit / _sc2_emit): extend the exact cubic to the
    wire's log_n+3 evaluation points, absorb into the device transcript,
    sample the next challenge. Operates on (16, deg+1) scalars — keyed by
    deg only, compiles in seconds.

JAX's async dispatch pipelines the per-round dispatches; the FS chain is
inherently sequential anyway. Emitted bytes are exactly what the host path
produces (the host verifier replays them with utils/transcript.Blake2sRng),
so this is purely an execution-strategy change: same wire format, same proof.

sc1_phase additionally folds in prover round 4 (va/vb/vc + the r_a/r_b/r_c
sampling — reference src/ahp/prover.rs:210-228) since it continues the same
transcript stretch.
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


@jax.jit
def _sc1_emit(q, tor_i, pre, state, c0, c1, c2, ea, eb):
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


@jax.jit
def _sc1_final(az, bz, cz, r_mont, state):
    """Round 4 on device: final fold -> va,vb,vc; absorb; sample r_a,r_b,r_c.

    az/bz/cz: (16, 2) Montgomery (post last sumcheck round). Fixed shapes —
    this program compiles once ever, shared by every proof size.
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


@jax.jit
def _sc2_emit(q, state):
    """Absorb a degree-2 round's 3 evals, sample the challenge. One program."""
    ev = fo.from_mont(FR, q)  # (16, 3)
    state = _feed_fr_vec(state, ev)
    r, r_mont, _ = _sample_mont(state, jnp.uint32(0))
    return ev, r, r_mont, state


def sc1_phase(az, bz, cz, suffix: Tuple, tor_mont, state):
    """Sumcheck 1 + round 4, device-resident transcript, per-round programs.

    az/bz/cz: (16, n) Montgomery tables. suffix: tuple of eq suffix tables of
    tor (mle.eq_suffix_tables). tor_mont: (16, log_n). state: (8,) transcript
    words (post-feed of the third prover message).

    Returns (evals (log_n, 16, deg+1) canonical, rs (16, log_n) canonical —
    the log_n sampled challenges (r_1..r_{log_n-1}, last_random_point),
    vabc (16, 3) canonical, rabc (16, 3) canonical, state' (8,)).
    """
    log_n = tor_mont.shape[1]
    n = az.shape[1]
    deg = log_n + 2
    consts = _emit_consts(deg)

    pre = fo.ones_mont(FR, (1,))
    r_mont = fo.encode_mont(FR, [0])  # dummy for the no-fold first round
    evals_out, rs_out = [], []
    for i in range(log_n):
        m_in = n >> max(0, i - 1)  # logical width entering (pre-fold)
        if i == 0:
            q, az, bz, cz = sck.sc1_round(az, bz, cz, suffix[1], False, r_mont)
        elif m_in > sck.TAIL_W:
            q, az, bz, cz = sck.sc1_round(az, bz, cz, suffix[i + 1], True, r_mont)
        else:
            az = sck.pad_cols(az, sck.TAIL_W)
            bz = sck.pad_cols(bz, sck.TAIL_W)
            cz = sck.pad_cols(cz, sck.TAIL_W)
            s = sck.pad_cols(suffix[i + 1], sck.TAIL_W // 4)
            q, az, bz, cz = sck.sc1_tail_round(az, bz, cz, s, r_mont)
        ev, r, r_mont, pre, state = _sc1_emit(
            q, tor_mont[:, i : i + 1], pre, state, *consts
        )
        evals_out.append(ev)
        rs_out.append(r)

    # tables may be tail-padded; the logical entries live in the front lanes
    vabc, rabc, state = _sc1_final(
        az[:, :2], bz[:, :2], cz[:, :2], r_mont, state
    )
    return (
        jnp.stack(evals_out, axis=0),
        jnp.concatenate(rs_out, axis=1),
        vabc,
        rabc,
        state,
    )


def sc2_phase(w, z, state):
    """Sumcheck 2, device-resident transcript: degree-2 rounds over w * z.

    Returns (evals (log_n, 16, 3) canonical, rs (16, log_n) canonical
    (r_1..r_{log_n-1}, last_random_point), state' (8,)).
    """
    n = int(w.shape[1])
    log_n = n.bit_length() - 1
    r_mont = fo.encode_mont(FR, [0])
    evals_out, rs_out = [], []
    for i in range(log_n):
        m_in = n >> max(0, i - 1)
        if i == 0:
            q, w, z = sck.prod2_round(w, z, False, r_mont)
        elif m_in > sck.TAIL_W:
            q, w, z = sck.prod2_round(w, z, True, r_mont)
        else:
            w = sck.pad_cols(w, sck.TAIL_W)
            z = sck.pad_cols(z, sck.TAIL_W)
            q, w, z = sck.prod2_tail_round(w, z, r_mont)
        ev, r, r_mont, state = _sc2_emit(q, state)
        evals_out.append(ev)
        rs_out.append(r)
    return jnp.stack(evals_out, axis=0), jnp.concatenate(rs_out, axis=1), state
