"""Random test-circuit synthesizer (the reference's circuit "model family").

TPU-native port-equivalent of ``TestSynthesizer``
(reference: src/data_structures/constraints.rs:8-111, itself adapted from the
zexe groth16 scalability example) and of
``generate_circuit_with_random_input`` (src/test_utils.rs:51-79): chains of
mul/add constraints with a tunable density knob plus dense square
constraints.

Behavioral quirk preserved: the reference pushes ``(a_val, a_var)`` twice
instead of ``(b_val, b_var)`` (constraints.rs:46-47) — harmless for
satisfiability but it shapes which variables get picked as offsets, so we
replicate it for structural parity.
"""

from __future__ import annotations

import random

from spartan_tpu.host import field as hf
from spartan_tpu.models.r1cs import (
    ConstraintSystem,
    LinearCombination,
    ONE,
    lc,
    make_matrices_square,
)


def synthesize(cs: ConstraintSystem, num_private: int, num_public: int, density: int, rng: random.Random):
    if num_public <= 3:
        raise ValueError("number of public variables should be greater than 3")
    assignments = []
    a_val = rng.randrange(hf.R)
    a_var = cs.new_input_variable(a_val)
    assignments.append((a_val, a_var))

    b_val = rng.randrange(hf.R)
    b_var = cs.new_input_variable(b_val)
    assignments.append((a_val, a_var))  # reference quirk: a pushed twice

    for _ in range(num_public - 3):
        val = rng.randrange(hf.R)
        var = cs.new_input_variable(val)
        assignments.append((val, var))

    num_sparse = (num_private - 1) * (510 - density) // 510

    for i in range(num_sparse):
        offset_idx = rng.randrange(2, num_public - 1)
        offset_val, offset_var = assignments[offset_idx]
        if i % 2 != 0:
            c_val = a_val * ((b_val + offset_val) % hf.R) % hf.R
            c_var = cs.new_witness_variable(c_val)
            cs.enforce_constraint(lc(a_var), lc(b_var, offset_var), lc(c_var))
        else:
            c_val = (a_val + b_val + offset_val) % hf.R
            c_var = cs.new_witness_variable(c_val)
            cs.enforce_constraint(lc(a_var, b_var, offset_var), lc(ONE), lc(c_var))
        assignments.append((c_val, c_var))
        a_val, a_var = b_val, b_var
        b_val, b_var = c_val, c_var

    for _ in range(num_sparse, num_private):
        # dense square constraint: sum of ALL assigned vars on both mul
        # inputs (reference constraints.rs:52-60). Built as one terms list:
        # the reference's `lc = lc + var` fold is amortized in Rust but
        # O(n^2) list copies here, which dominated circuit gen at 2^18.
        dense_terms = [(1, var) for _val, var in assignments]
        a_lc = LinearCombination(list(dense_terms))
        b_lc = LinearCombination(list(dense_terms))
        c_val = sum(val for val, _var in assignments) % hf.R
        c_val = c_val * c_val % hf.R
        c_var = cs.new_witness_variable(c_val)
        cs.enforce_constraint(a_lc, b_lc, lc(c_var))


def generate_circuit_with_random_input(
    num_public: int,
    num_private: int,
    pad_to_square: bool,
    density: int,
    rng: random.Random,
):
    """Build a random satisfiable circuit; returns (cs, v, w)
    (reference: src/test_utils.rs:51-79)."""
    cs = ConstraintSystem()
    synthesize(cs, num_private, num_public, density, rng)
    if pad_to_square:
        make_matrices_square(cs, num_public + num_private)
    v, w = cs.assignment()
    return cs, v, w


def random_matrix(log_size: int, num_non_zero: int, rng: random.Random):
    """Random sparse square matrix (reference: src/test_utils.rs:18-37)."""
    bound = 1 << log_size
    mat = [[] for _ in range(bound)]
    added = set()
    for _ in range(num_non_zero):
        x = rng.randrange(bound)
        y = rng.randrange(bound)
        while (x, y) in added:
            x = rng.randrange(bound)
            y = rng.randrange(bound)
        added.add((x, y))
        mat[x].append((rng.randrange(hf.R), y))
    return mat


def bits_to_field_elements(bits: int, num_bits: int):
    """LSB-first bit decomposition into 0/1 field elements
    (reference: src/test_utils.rs:39-49)."""
    return [(bits >> i) & 1 for i in range(num_bits)]
