"""R1CS indexer: wrap A, B, C as matrix-MLE objects with device COO buffers.

TPU-native equivalent of reference src/ahp/indexer.rs (IndexPK/IndexVK,
index()) and the MatrixExtension wrapper src/data_structures/r1cs_reader.rs.
The reference stores matrices as raw sparse rows and walks them per use; here
indexing also uploads a flat COO (rows, cols, Montgomery values) so every
later sparse op is a single gather/segment-sum kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import jax.numpy as jnp

from spartan_tpu.models.r1cs import Matrix, matrix_to_coo, validate_matrix
from spartan_tpu.ops import field as fo
from spartan_tpu.ops import mle, sparse
from spartan_tpu.ops.field import FR
from spartan_tpu.utils import serialize as ser
from spartan_tpu.utils.errors import invalid_arg


@dataclass
class MatrixExtension:
    """Sparse matrix M viewed as the 2*log_n-variable MLE M(x, y) with index
    packing (y << s) + x (reference: r1cs_reader.rs:22 xy_combine)."""

    rows_list: Matrix  # host sparse rows (for serialization/FS)
    num_constraints: int
    # (rows int32, cols int32, vals (16,nnz) Montgomery, row_aux, col_aux)
    # device buffers; row_aux/col_aux are None unless some row/column holds
    # >= 2^16 entries (then (sub_idx, sub_to_seg) for the two-stage
    # segment sum — ops/sparse.dense_segment_aux)
    coo: tuple
    _ser_cache: bytes = None  # serialize() result (O(nnz) bytes, built once)

    @classmethod
    def new(cls, matrix: Matrix, num_constraints: int) -> "MatrixExtension":
        validate_matrix(matrix, num_constraints)
        rows, cols, vals = matrix_to_coo(matrix)
        if not rows:  # keep kernels shape-valid for empty matrices
            rows, cols, vals = [0], [0], [0]
        dev_aux = lambda aux: None if aux is None else (
            jnp.asarray(aux[0]), jnp.asarray(aux[1])
        )
        coo = (
            jnp.asarray(np.array(rows, np.int32)),
            jnp.asarray(np.array(cols, np.int32)),
            fo.encode_mont(FR, vals),
            dev_aux(sparse.dense_segment_aux(rows)),
            dev_aux(sparse.dense_segment_aux(cols)),
        )
        return cls(rows_list=matrix, num_constraints=num_constraints, coo=coo)

    def serialize(self) -> bytes:
        """Bytes fed to the FS transcript (reference feeds the whole
        serialized matrix up front, src/lib.rs:62-64). Cached: the O(nnz)
        packing loop would otherwise run on EVERY prove and verify, and the
        matrix is immutable after indexing. The same buffer also feeds the
        native verifier matrix evaluation (host/native.matrix_eval_native)."""
        if self._ser_cache is None:
            self._ser_cache = ser.ser_matrix(self.rows_list) + ser.ser_u64(
                self.num_constraints
            )
        return self._ser_cache

    # -- MLE ops (device) --------------------------------------------------
    def sum_over_y(self, z):
        """x -> sum_y M[x,y] z[y] (r1cs_reader.rs:75-85)."""
        if z.shape[1] != self.num_constraints:
            raise invalid_arg("invalid z")
        return sparse.sum_over_y(self.coo, z, self.num_constraints)

    def eval_on_x(self, r_x: List[int]):
        """y -> M(r_x, y) (r1cs_reader.rs:91-117)."""
        if (1 << len(r_x)) != self.num_constraints:
            raise invalid_arg("2^|r_x| should be num_constraints")
        eqx = mle.eq_table(fo.encode_mont(FR, r_x))
        return sparse.eval_on_x_table(self.coo, eqx, self.num_constraints)


@dataclass
class IndexPK:
    """Prover key (reference: indexer.rs:11-18)."""

    matrix_a: MatrixExtension
    matrix_b: MatrixExtension
    matrix_c: MatrixExtension
    log_n: int  # log(|v| + |w|)

    def vk(self) -> "IndexVK":
        return IndexVK(self.matrix_a, self.matrix_b, self.matrix_c, self.log_n)


@dataclass
class IndexVK:
    """Verifier key — a clone of the PK (reference: indexer.rs:21-38; the
    verifier is O(nnz), not succinct — SURVEY.md §3.0)."""

    matrix_a: MatrixExtension
    matrix_b: MatrixExtension
    matrix_c: MatrixExtension
    log_n: int


def index(matrix_a: Matrix, matrix_b: Matrix, matrix_c: Matrix) -> IndexPK:
    """reference: indexer.rs:41-64."""
    n = len(matrix_a)
    if n == 0 or n & (n - 1):
        raise invalid_arg("Matrix width should be a power of 2.")
    log_n = n.bit_length() - 1
    return IndexPK(
        matrix_a=MatrixExtension.new(matrix_a, n),
        matrix_b=MatrixExtension.new(matrix_b, n),
        matrix_c=MatrixExtension.new(matrix_c, n),
        log_n=log_n,
    )
