"""Multilinear pairing polynomial commitment (PST/Libra-style).

TPU-native equivalent of reference src/commitment/ (MLPolyCommit):
keygen / commit / open / verify.
"""

from spartan_tpu.commitment.data_structures import (
    Commitment,
    OpenProof,
    PublicParameter,
    VerifierParameter,
)
from spartan_tpu.commitment.scheme import commit, keygen, open_poly, verify
