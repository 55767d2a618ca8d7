"""Polynomial-commitment parameter types.

TPU-native equivalent of reference src/commitment/data_structures.rs:10-26
(``PublicParameter{nv, powers_of_g, powers_of_h, g, h}`` — "pp_k defined by
libra" — and ``VerifierParameter{nv, g, h, g_mask_random}``).

Device-resident representation: the evaluation hypercubes powers_of_g[i]
(G1, size 2^(nv-i)) and powers_of_h[i] (G2) are PointBatch arrays in affine
form (Jacobian with Z=1), ready to be MSM bases. The scalar generators and
verifier masks are host affine points (they only feed pairings).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from spartan_tpu.ops.curve import PointBatch
from spartan_tpu.utils import serialize as ser


@dataclass
class PublicParameter:
    nv: int
    powers_of_g: List[PointBatch]  # level i: G1 batch of size 2^(nv-i)
    powers_of_h: List[PointBatch]  # level i: G2 batch of size 2^(nv-i)
    g: tuple  # host affine G1
    h: tuple  # host affine G2
    # Pairwise-combined opening bases: comb[i][j] = H_i[2j] + H_i[2j+1].
    # The reference's open duplicates each quotient scalar across a base pair
    # (open.rs:46-48); an MSM over combined bases is algebraically identical
    # at half the points. Precomputed once at keygen.
    powers_of_h_comb: Optional[List[PointBatch]] = None


@dataclass
class VerifierParameter:
    nv: int
    g: tuple  # host affine G1
    h: tuple  # host affine G2
    g_mask_random: List[tuple]  # host affine G1: g^{t_i}


@dataclass(frozen=True)
class Commitment:
    """reference: src/commitment/commit.rs:11-14."""

    nv: int
    g_product: Optional[tuple]  # host affine G1 (None = infinity)

    def serialize(self) -> bytes:
        return ser.ser_u64(self.nv) + ser.ser_g1(self.g_product)


@dataclass(frozen=True)
class OpenProof:
    """reference: src/commitment/open.rs:12-15 (h + nv G2 points)."""

    h: tuple  # host affine G2
    proofs: List[tuple]  # host affine G2 points

    def serialize(self) -> bytes:
        return ser.ser_g2(self.h) + ser.ser_u64(len(self.proofs)) + b"".join(
            ser.ser_g2(p) for p in self.proofs
        )
