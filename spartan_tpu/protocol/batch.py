"""Batched proving: many independent instances of the same circuit.

The data-parallel analog for a zk prover (SURVEY.md §2.3: the reference has
no parallelism; BASELINE.json's throughput config is "64 independent 2^16
instances pipelined"). Instances share the IndexPK (same circuit, different
public inputs/witnesses) and therefore share every compiled kernel: after the
first proof compiles the pipeline, each additional proof reuses it, so
throughput approaches device-bound time per proof.

Each instance keeps its own Fiat–Shamir transcript (it absorbs the instance's
public input — src/lib.rs:65). Cross-instance device batching of the
sumcheck rounds (stacked (16, B, N) tables, one dispatch per round for the
whole batch) is the planned next step; the kernels already accept batched
shapes (ops/mle.py fold/sum_mod).
"""

from __future__ import annotations

from typing import List, Tuple

from spartan_tpu.commitment import PublicParameter
from spartan_tpu.protocol.argument import MLArgumentForR1CS
from spartan_tpu.protocol.indexer import IndexPK
from spartan_tpu.protocol.proof import Proof


def prove_batch(
    pk: IndexPK, instances: List[Tuple[List[int], List[int]]], pp: PublicParameter
) -> List[Proof]:
    """Prove all (v, w) instances; returns one Proof per instance."""
    return [MLArgumentForR1CS.prove(pk, v, w, pp) for v, w in instances]


def verify_batch(vk, instances, proofs, vp) -> List[bool]:
    out = []
    for (v, _w), proof in zip(instances, proofs):
        out.append(MLArgumentForR1CS.verify(vk, v, proof, vp))
    return out
