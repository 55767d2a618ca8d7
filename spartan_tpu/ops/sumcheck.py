"""Fused sumcheck round kernels: fold + evaluate in one device dispatch.

The Fiat–Shamir loop forces one host<->device round trip per sumcheck round
(evaluations out, challenge in — inherently sequential, SURVEY.md §2.3), so
everything else in a round must be a single fused dispatch. These jitted
functions fold the tables with the incoming challenge and produce the round
evaluations in one call; the protocol layer decodes 3 scalars per round.

sc1_round: the Spartan first-sumcheck round (SURVEY.md §3.0 / prover.rs:
163-207 semantics, rebuilt at O(n)/round — see protocol/prover.py docstring).
prod2_round: a degree-2 round for a product of two MLEs (sumcheck 2,
prover.rs:230-266).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from spartan_tpu.ops import field as fo
from spartan_tpu.ops import mle
from spartan_tpu.ops.field import FR


def _halves(tab):
    """Split the (minor) table axis into even/odd halves; any batch dims."""
    n = tab.shape[-1]
    p = tab.reshape(tab.shape[:-1] + (n // 2, 2))
    return p[..., 0], p[..., 1]


def _eval3(factors_e, factors_o, weight=None):
    """Evaluate sum_b prod_k f_k(t, b) (optionally * weight[b]) at t = 0,1,2.

    factors_e/o: per-factor even/odd half tables. Returns (16, 3) canonical.
    """
    diffs = [fo.sub(FR, o, e) for e, o in zip(factors_e, factors_o)]
    outs = []
    cur = list(factors_e)
    for t in range(3):
        if t > 0:
            cur = [fo.add(FR, c, d) for c, d in zip(cur, diffs)]
        acc = cur[0]
        for fct in cur[1:]:
            acc = fo.mont_mul(FR, acc, fct)
        if weight is not None:
            acc = fo.mont_mul(FR, acc, weight)
        outs.append(mle.sum_mod(acc))
    return jnp.concatenate(outs, axis=1)  # (16, 3)


def sc1_evals3(az, bz, cz, s_table):
    """Inner quadratic of a Spartan SC1 round at t = 0,1,2:
    sum_b S[b] * (Az_t Bz_t - Cz_t)[b]. Returns (16, 3) Montgomery."""
    az_e, az_o = _halves(az)
    bz_e, bz_o = _halves(bz)
    cz_e, cz_o = _halves(cz)
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
        outs.append(mle.sum_mod(val))
    return jnp.concatenate(outs, axis=1)


@partial(jax.jit, static_argnums=(4,))
def sc1_round(az, bz, cz, s_table, do_fold: bool, r):
    """One Spartan SC1 round: optional fold by r, then the inner quadratic.

    Returns ((16,3) evals, az', bz', cz') — a single device dispatch.
    """
    if do_fold:
        az = mle.fold(az, r)
        bz = mle.fold(bz, r)
        cz = mle.fold(cz, r)
    return sc1_evals3(az, bz, cz, s_table), az, bz, cz


def prod2_evals3(w, z):
    """Degree-2 round evals at t = 0,1,2 for sum_b w(t,b) z(t,b)."""
    w_e, w_o = _halves(w)
    z_e, z_o = _halves(z)
    return _eval3([w_e, z_e], [w_o, z_o])


@partial(jax.jit, static_argnums=(2,))
def prod2_round(w, z, do_fold: bool, r):
    """One degree-2 round for sum_b w(t,b) z(t,b): evals at t = 0,1,2."""
    if do_fold:
        w = mle.fold(w, r)
        z = mle.fold(z, r)
    return prod2_evals3(w, z), w, z


# ---------------------------------------------------------------------------
# Fixed-width tail rounds
#
# Per-width round programs are shared across proof sizes, but a cold prove at
# 2^k would still compile ~k of them. Once tables shrink to TAIL_W the rounds
# run in ONE fixed-width program instead: tables stay physically (16, TAIL_W),
# zero-padded beyond the logical size. Zero is a fixed point of fold/add/mul,
# and the inner sums weight pad lanes by a zero-padded suffix table (or by
# zero products), so the emitted evaluations are bit-identical to the
# per-width path. Wasted work is O(TAIL_W * log TAIL_W) field ops per proof —
# noise next to the MSMs.
# ---------------------------------------------------------------------------

TAIL_W = 1024


def pad_cols(t, w: int):
    """Zero-pad the minor axis to width w (no-op if already there)."""
    if t.shape[-1] == w:
        return t
    return jnp.concatenate(
        [t, jnp.zeros(t.shape[:-1] + (w - t.shape[-1],), t.dtype)], axis=-1
    )


# The per-round tail programs live in protocol/fused.py as ONE lax.scan
# program per phase (_sc1_tail_phase / _sc2_tail_phase) built on pad_cols,
# sc1_evals3 and prod2_evals3 — see that module's program-shape rationale.
