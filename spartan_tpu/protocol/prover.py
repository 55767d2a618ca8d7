"""Spartan AHP prover: 6 rounds + two sumchecks (reference src/ahp/prover.rs).

State machine mirrors the reference exactly (7 typed states, 6 typed
messages, each round consumes the previous state — prover.rs:25-104), but the
compute is rebuilt TPU-first. The key redesign is sumcheck 1:

The reference expresses round-1's polynomial as products of log_n + 2
multilinears (Az, Bz, and eq(tor,.) *factored* into log_n per-variable
factors — prover.rs:175-181), making its generic sumcheck kernel do
O(n log^2 n) work on O(n log n) memory. But each eq factor depends on a
single variable, so the *actual* round-i univariate

    g_i(t) = [prod_{j<i} l_j(r_j)] * l_i(t) *
             sum_b eq(tor_{i+1..}, b) * (Az(t,b) Bz(t,b) - Cz(t,b))

is degree 3: l_i(t) is linear and the bracketed sum is quadratic in t. We
evaluate the quadratic at t = 0,1,2 with three fused table passes (O(n) work,
single eq suffix table), then extend the exact cubic to the
max_multiplicands+1 = log_n+3 evaluation points the wire format requires
(sumcheck.ProverMsg). The emitted message values are *identical* to the
reference's — it evaluates the same polynomial pointwise — at ~log_n x less
work and memory.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp

from spartan_tpu.host import field as hf
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import mle
from spartan_tpu.ops import sumcheck as sck
from spartan_tpu.ops.field import FR
from spartan_tpu.protocol import sumcheck as sc
from spartan_tpu.protocol.indexer import IndexPK
from spartan_tpu.commitment import PublicParameter, commit, open_poly
from spartan_tpu.commitment.data_structures import Commitment, OpenProof
from spartan_tpu.utils import serialize as ser
from spartan_tpu.utils.errors import invalid_arg
from spartan_tpu.utils.timers import span


def ell(tor_j: int, t: int) -> int:
    """The per-variable eq factor l_j(t) = tor_j t + (1 - tor_j)(1 - t)
    (reference eq.rs:8-16: t_i x_i 2 - x_i - t_i + 1, same polynomial)."""
    return (tor_j * t + (1 - tor_j) * (1 - t)) % hf.R


# ---------------------------------------------------------------------------
# Messages (wire format; serialized bytes feed the FS transcript)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ProverFirstMessage:
    commitment: Commitment

    def serialize(self) -> bytes:
        return self.commitment.serialize()


@dataclass(frozen=True)
class ProverSecondMessage:
    z_rv_0: int
    proof_for_z_rv_0: OpenProof

    def serialize(self) -> bytes:
        return ser.ser_fr(self.z_rv_0) + self.proof_for_z_rv_0.serialize()


@dataclass(frozen=True)
class ProverThirdMessage:
    ml_index_info: sc.IndexInfo

    def serialize(self) -> bytes:
        return self.ml_index_info.serialize()


@dataclass(frozen=True)
class ProverFourthMessage:
    va: int
    vb: int
    vc: int

    def serialize(self) -> bytes:
        return ser.ser_fr(self.va) + ser.ser_fr(self.vb) + ser.ser_fr(self.vc)


@dataclass(frozen=True)
class ProverFifthMessage:
    index_info: sc.IndexInfo

    def serialize(self) -> bytes:
        return self.index_info.serialize()


@dataclass(frozen=True)
class ProverSixthMessage:
    z_ry: int
    proof_for_z_ry: OpenProof

    def serialize(self) -> bytes:
        return ser.ser_fr(self.z_ry) + self.proof_for_z_ry.serialize()


ProverFinalMessage = ProverSixthMessage


# ---------------------------------------------------------------------------
# States (linear machine, reference prover.rs:25-63)
# ---------------------------------------------------------------------------


@dataclass
class ProverFirstState:
    v: List[int]
    w: List[int]
    pk: IndexPK


@dataclass
class ProverSecondState:
    v: List[int]
    w: List[int]
    pk: IndexPK
    z: jnp.ndarray  # (16, n) Montgomery


@dataclass
class ProverThirdState:
    pk: IndexPK
    z: jnp.ndarray


@dataclass
class ProverFirstSumcheckState:
    pk: IndexPK
    z: jnp.ndarray
    az: jnp.ndarray  # folded sum_y A z tables
    bz: jnp.ndarray
    cz: jnp.ndarray
    suffix: list  # eq suffix tables of tor
    tor: List[int]
    pre: int  # prod_{j < round} l_j(r_j)
    round: int
    randomness: List[int]


@dataclass
class ProverFifthState:
    pk: IndexPK
    z: jnp.ndarray
    r_x: List[int]


@dataclass
class ProverSecondSumcheckState:
    z: jnp.ndarray  # the ORIGINAL z table (opened at r_y in round 6)
    w_cur: jnp.ndarray  # folded (r_a A + r_b B + r_c C)(r_x, .) table
    z_cur: jnp.ndarray  # folded copy of z for the sumcheck
    round: int
    randomness: List[int]


# ---------------------------------------------------------------------------
# Rounds
# ---------------------------------------------------------------------------


def prover_init(pk: IndexPK, v: List[int], w: List[int]) -> ProverFirstState:
    """reference prover.rs:109-121."""
    if len(v) == 0 or len(v) & (len(v) - 1):
        raise invalid_arg("public input should be power of two")
    if len(v) + len(w) != pk.matrix_a.num_constraints:
        raise invalid_arg("|v| + |w| != number of variables")
    return ProverFirstState(v=list(v), w=list(w), pk=pk)


def prover_first_round(state: ProverFirstState, pp: PublicParameter):
    """Commit to z = v || w (prover.rs:123-141)."""
    z = fo.encode_mont(FR, state.v + state.w)
    with span("Prove 1: commit z"):
        com = commit(pp, z)
    return (
        ProverSecondState(v=state.v, w=state.w, pk=state.pk, z=z),
        ProverFirstMessage(commitment=com),
    )


def prover_second_round(state: ProverSecondState, r_v: List[int], pp: PublicParameter):
    """Open z at (r_v || 0...0) (prover.rs:143-160)."""
    log_n = state.pk.log_n
    point = list(r_v) + [0] * (log_n - len(r_v))
    with span("Prove 2: open z(r_v,0..)"):
        z_rv_0, proof, _ = open_poly(pp, state.z, point)
    return (
        ProverThirdState(pk=state.pk, z=state.z),
        ProverSecondMessage(z_rv_0=z_rv_0, proof_for_z_rv_0=proof),
    )


import jax as _jax

from spartan_tpu.ops import sparse as _sparse


@_jax.jit
def _third_round_fused(coo_a, coo_b, coo_c, z, tor_mont):
    """3x sparse mat-vec + the eq suffix ladder in ONE program.

    The per-call versions issued ~8 dispatches; through the remote tunnel
    each dispatch costs ~20 ms of latency, which dominated Prove 3.
    """
    n = z.shape[1]
    az = _sparse.sum_over_y(coo_a, z, n)
    bz = _sparse.sum_over_y(coo_b, z, n)
    cz = _sparse.sum_over_y(coo_c, z, n)
    suffix = mle.eq_suffix_tables_mont(tor_mont)
    return az, bz, cz, tuple(suffix)


@_jax.jit
def _fifth_round_fused(coo_a, coo_b, coo_c, rx_mont, rabc_mont):
    """eq(r_x, .) table + 3x sparse partial-eval + combine, ONE program."""
    n = 1 << rx_mont.shape[1]
    eqx = mle.eq_table(rx_mont)
    w = mle.scale(_sparse.eval_on_x_table(coo_a, eqx, n), rabc_mont[:, 0])
    w = fo.add(
        FR, w, mle.scale(_sparse.eval_on_x_table(coo_b, eqx, n), rabc_mont[:, 1])
    )
    w = fo.add(
        FR, w, mle.scale(_sparse.eval_on_x_table(coo_c, eqx, n), rabc_mont[:, 2])
    )
    return w


def prover_third_round(state: ProverThirdState, tor: List[int]):
    """Sparse A z / B z / C z + eq suffix tables; propose sumcheck 1
    (prover.rs:163-196)."""
    pk = state.pk
    with span("Prove 3: sparse mat-vec + eq"):
        az, bz, cz, suffix = _third_round_fused(
            pk.matrix_a.coo, pk.matrix_b.coo, pk.matrix_c.coo, state.z,
            fo.encode_mont(FR, tor),
        )
        suffix = list(suffix)
    info = sc.IndexInfo(max_multiplicands=pk.log_n + 2, num_variables=pk.log_n)
    next_state = ProverFirstSumcheckState(
        pk=pk, z=state.z, az=az, bz=bz, cz=cz, suffix=suffix,
        tor=list(tor), pre=1, round=0, randomness=[],
    )
    return next_state, ProverThirdMessage(ml_index_info=info)


def prove_first_sumcheck_round(
    state: ProverFirstSumcheckState, v_msg: Optional[sc.VerifierMsg]
):
    """One sumcheck-1 round: fold on randomness, emit g_i at 0..log_n+2.

    Device work is one fused dispatch (fold + inner quadratic at t = 0,1,2,
    ops/sumcheck.sc1_round); the host extends the exact cubic to the wire's
    log_n+3 evaluation points.
    """
    l = state.pk.log_n
    i = state.round
    if i >= l:
        raise invalid_arg("sumcheck 1 already finished")
    do_fold = i > 0
    if do_fold:
        if v_msg is None:
            raise invalid_arg("expected verifier randomness")
        r = v_msg.randomness
        r_dev = fo.encode_mont(FR, [r])
        state.pre = state.pre * ell(state.tor[i - 1], r) % hf.R
        state.randomness.append(r)
    else:
        if v_msg is not None:
            raise invalid_arg("first round takes no randomness")
        r_dev = fo.encode_mont(FR, [0])

    s_table = state.suffix[i + 1]
    evals3, state.az, state.bz, state.cz = sck.sc1_round(
        state.az, state.bz, state.cz, s_table, do_fold, r_dev
    )
    inner = fo.decode_mont(FR, evals3)

    # host: extend the exact cubic pre * l_i(t) * q(t) to 0..deg evaluation points
    q0, q1, q2 = inner
    inv2 = hf.fr_inv(2)

    def q_at(t: int) -> int:
        return (
            q0 * ((t - 1) * (t - 2) % hf.R) % hf.R * inv2
            - q1 * (t * (t - 2) % hf.R)
            + q2 * (t * (t - 1) % hf.R) % hf.R * inv2
        ) % hf.R

    tor_i = state.tor[i]
    deg = l + 2
    evals = [
        state.pre * ell(tor_i, t) % hf.R * q_at(t) % hf.R for t in range(deg + 1)
    ]
    state.round += 1
    return state, sc.ProverMsg(evaluations=evals)


def prove_fourth_round(state: ProverFirstSumcheckState, last_random_point: int):
    """Final fold; send va, vb, vc = (A z~)(r_x), ... (prover.rs:210-228)."""
    r_dev = fo.encode_mont(FR, [last_random_point])
    abz = jnp.concatenate([state.az, state.bz, state.cz], axis=1)
    r_x = state.randomness + [last_random_point]
    va, vb, vc = fo.decode_mont(FR, mle.fold(abz, r_dev))  # one fetch
    return (
        ProverFifthState(pk=state.pk, z=state.z, r_x=r_x),
        ProverFourthMessage(va=va, vb=vb, vc=vc),
    )


def prove_fifth_round(state: ProverFifthState, r_a: int, r_b: int, r_c: int):
    """Prepare sumcheck 2 over (r_a A + r_b B + r_c C)(r_x, .) * z
    (prover.rs:230-255). The reference builds three 2-factor products; the
    combined single product is the same polynomial (sum of the three)."""
    pk = state.pk
    with span("Prove 5: eval_on_x + combine"):
        w = _fifth_round_fused(
            pk.matrix_a.coo, pk.matrix_b.coo, pk.matrix_c.coo,
            fo.encode_mont(FR, state.r_x), fo.encode_mont(FR, [r_a, r_b, r_c]),
        )
    # wire format: the reference proposes 3 products of 2 factors each ->
    # max_multiplicands = 2, identical to the combined form's index info.
    info = sc.IndexInfo(max_multiplicands=2, num_variables=pk.log_n)
    return (
        ProverSecondSumcheckState(
            z=state.z, w_cur=w, z_cur=state.z, round=0, randomness=[]
        ),
        ProverFifthMessage(index_info=info),
    )


def prove_second_sumcheck_round(
    state: ProverSecondSumcheckState, v_msg: Optional[sc.VerifierMsg]
):
    """One degree-2 sumcheck round over W * z (fused device dispatch)."""
    do_fold = state.round > 0
    if do_fold:
        if v_msg is None:
            raise invalid_arg("expected verifier randomness")
        state.randomness.append(v_msg.randomness)
        r_dev = fo.encode_mont(FR, [v_msg.randomness])
    else:
        if v_msg is not None:
            raise invalid_arg("first round takes no randomness")
        r_dev = fo.encode_mont(FR, [0])
    evals3, state.w_cur, state.z_cur = sck.prod2_round(
        state.w_cur, state.z_cur, do_fold, r_dev
    )
    state.round += 1
    return state, sc.ProverMsg(evaluations=fo.decode_mont(FR, evals3))


def prove_sixth_round(
    state: ProverSecondSumcheckState, last_random_point: int, pp: PublicParameter
) -> ProverSixthMessage:
    """Open z at r_y (prover.rs:268-281)."""
    r_y = state.randomness + [last_random_point]
    with span("Prove 6: open z(r_y)"):
        z_ry, proof, _ = open_poly(pp, state.z, r_y)
    return ProverSixthMessage(z_ry=z_ry, proof_for_z_ry=proof)
