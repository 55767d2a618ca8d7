"""R1CS constraint-system model: sparse matrices and a builder.

TPU-native equivalent of the slice of ``ark-relations`` the reference uses
(SURVEY.md §2.2 row "ark-relations R1CS builder"; reference use sites:
``Matrix<F>`` sparse rows src/ahp/indexer.rs:6, ``ConstraintSystem`` /
``to_matrices`` / ``inline_all_lcs`` src/test_utils.rs:51-79).

Matrix format matches the reference exactly: a list of rows, each row a list
of ``(coeff:int, var_index:int)`` pairs; the full assignment is
``z = v || w`` with ``v[0] = 1`` (the constant One variable, ark-relations
convention) — so var_index < len(v) addresses a public input and the rest
address witness variables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from spartan_tpu.host import field as hf
from spartan_tpu.utils.errors import invalid_arg

Matrix = List[List[Tuple[int, int]]]  # rows of (coeff, var_index)


@dataclass
class LinearCombination:
    """Sum of coeff * variable terms. Variables are ("instance"|"witness", i)."""

    terms: list = field(default_factory=list)

    def __add__(self, other):
        if isinstance(other, LinearCombination):
            return LinearCombination(self.terms + other.terms)
        return LinearCombination(self.terms + [(1, other)])

    def add_term(self, coeff: int, var):
        return LinearCombination(self.terms + [(coeff % hf.R, var)])


def lc(*vars_):
    """lc!() + var + var ... convenience (reference: ark lc! macro)."""
    out = LinearCombination()
    for v in vars_:
        out = out + v
    return out


ONE = ("instance", 0)


class ConstraintSystem:
    """Minimal prove-mode constraint system with assignments.

    Mirrors the behavior the reference's tests rely on
    (src/test_utils.rs:51-79): collect instance/witness assignments, build
    A/B/C rows from already-inlined linear combinations.
    """

    def __init__(self):
        self.instance_assignment: list = [1]  # One
        self.witness_assignment: list = []
        self.a_rows: Matrix = []
        self.b_rows: Matrix = []
        self.c_rows: Matrix = []

    # -- variables ---------------------------------------------------------
    def new_input_variable(self, value: int):
        idx = len(self.instance_assignment)
        self.instance_assignment.append(value % hf.R)
        return ("instance", idx)

    def new_witness_variable(self, value: int):
        idx = len(self.witness_assignment)
        self.witness_assignment.append(value % hf.R)
        return ("witness", idx)

    # -- constraints -------------------------------------------------------
    def _row(self, comb: LinearCombination) -> list:
        num_v = len(self.instance_assignment)
        # merge duplicate variables (ark inline_all_lcs compacts terms)
        acc = {}
        for coeff, (kind, i) in comb.terms:
            col = i if kind == "instance" else num_v + i
            acc[col] = (acc.get(col, 0) + coeff) % hf.R
        return [(c, col) for col, c in sorted(acc.items()) if c != 0]

    def enforce_constraint(self, a: LinearCombination, b: LinearCombination, c: LinearCombination):
        self.a_rows.append(self._row(a))
        self.b_rows.append(self._row(b))
        self.c_rows.append(self._row(c))

    @property
    def num_constraints(self) -> int:
        return len(self.a_rows)

    @property
    def num_instance_variables(self) -> int:
        return len(self.instance_assignment)

    @property
    def num_witness_variables(self) -> int:
        return len(self.witness_assignment)

    def to_matrices(self):
        """NOTE: rows reference columns as v-index or |v| + w-index; callers
        must finalize variable count before proving."""
        return self.a_rows, self.b_rows, self.c_rows

    # -- sanity ------------------------------------------------------------
    def assignment(self):
        return list(self.instance_assignment), list(self.witness_assignment)

    def is_satisfied(self) -> bool:
        z = self.instance_assignment + self.witness_assignment

        def ev(row):
            return sum(c * z[i] for c, i in row) % hf.R

        for ra, rb, rc in zip(self.a_rows, self.b_rows, self.c_rows):
            if ev(ra) * ev(rb) % hf.R != ev(rc):
                return False
        return True


def make_matrices_square(cs: ConstraintSystem, num_formatted_variables: int):
    """Pad with 0*0=0 constraints or dummy witnesses until square
    (reference: src/test_utils.rs:81-102)."""
    num_constraints = cs.num_constraints
    padding = abs(num_formatted_variables - num_constraints)
    if num_formatted_variables > num_constraints:
        for _ in range(padding):
            cs.enforce_constraint(lc(), lc(), lc())
    else:
        for _ in range(padding):
            cs.new_witness_variable(1)


def validate_matrix(matrix: Matrix, num_constraints: int):
    """Power-of-two and bounds checks (reference: r1cs_reader.rs:38-70)."""
    if num_constraints & (num_constraints - 1) or num_constraints == 0:
        raise invalid_arg("num of constraints should be power of two")
    if len(matrix) != num_constraints:
        raise invalid_arg("matrix size is inconsistent with number of constraints")
    col_nnz: dict = {}
    for row in matrix:
        for _, idx in row:
            if idx >= num_constraints:
                raise invalid_arg("sparse index out of bound")
            col_nnz[idx] = col_nnz.get(idx, 0) + 1
        if len(row) >= 1 << 31:
            raise invalid_arg("row too dense for segment-sum kernel (>= 2^31 nnz)")
    # rows/columns with >= 2^16 entries use the two-stage segment sum
    # (ops/sparse.dense_segment_aux, built by the indexer); its stage-2
    # fan-in stays < 2^16 partials per segment only below 2^31 entries, so
    # that is the hard cap (reference walks rows/columns with unbounded
    # scalar loops, r1cs_reader.rs:75-117).
    if col_nnz and max(col_nnz.values()) >= 1 << 31:
        raise invalid_arg("column too dense for segment-sum kernel (>= 2^31 nnz)")


def matrix_to_coo(matrix: Matrix):
    """Flatten a row-list matrix to (rows, cols, vals-ints) COO triples."""
    rows, cols, vals = [], [], []
    for x, row in enumerate(matrix):
        for coeff, y in row:
            rows.append(x)
            cols.append(y)
            vals.append(coeff % hf.R)
    return rows, cols, vals
