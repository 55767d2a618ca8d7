"""MLE engine + sparse kernels vs scalar oracle."""

import random

import numpy as np
import jax.numpy as jnp

from spartan_tpu.host import field as hf
from spartan_tpu.ops import field as f
from spartan_tpu.ops import mle, sparse
from spartan_tpu.ops.field import FR
from spartan_tpu.models.synthesizer import bits_to_field_elements, random_matrix
from spartan_tpu.models.r1cs import matrix_to_coo


def _mle_eval_oracle(table_ints, point_ints):
    """Naive multilinear evaluation: fold variable 0 first."""
    t = list(table_ints)
    for r in point_ints:
        t = [(t[2 * b] + r * (t[2 * b + 1] - t[2 * b])) % hf.R for b in range(len(t) // 2)]
    return t[0]


def test_fold_eval_matches_oracle():
    rng = random.Random(0)
    nv = 5
    table_ints = [rng.randrange(hf.R) for _ in range(1 << nv)]
    point_ints = [rng.randrange(hf.R) for _ in range(nv)]
    table = f.encode_mont(FR, table_ints)
    point = f.encode_mont(FR, point_ints)
    got = f.decode_mont(FR, mle.eval_at(table, point))[0]
    assert got == _mle_eval_oracle(table_ints, point_ints)


def test_eq_table_indicator():
    # eq(t, x) over the cube is the 0/1 indicator when t is boolean
    # (reference test: src/data_structures/eq.rs functionality_test)
    t_bits = 0b10110
    nv = 5
    t_ints = bits_to_field_elements(t_bits, nv)
    ts = f.encode_mont(FR, t_ints)
    table = f.decode_mont(FR, mle.eq_table(ts))
    for x in range(1 << nv):
        assert table[x] == (1 if x == t_bits else 0)


def test_eq_table_random_point():
    rng = random.Random(1)
    nv = 4
    t_ints = [rng.randrange(hf.R) for _ in range(nv)]
    ts = f.encode_mont(FR, t_ints)
    table = f.decode_mont(FR, mle.eq_table(ts))
    for x in range(1 << nv):
        expect = 1
        for i in range(nv):
            xi = (x >> i) & 1
            ti = t_ints[i]
            expect = expect * ((ti * xi + (1 - ti) * (1 - xi)) % hf.R) % hf.R
        assert table[x] == expect


def test_eq_suffix_tables_consistent():
    rng = random.Random(2)
    nv = 4
    t_ints = [rng.randrange(hf.R) for _ in range(nv)]
    suf = mle.eq_suffix_tables(t_ints)
    assert suf[nv].shape == (16, 1)
    # S[0] must equal the full eq table
    full = f.decode_mont(FR, mle.eq_table(f.encode_mont(FR, t_ints)))
    assert f.decode_mont(FR, suf[0]) == full
    # S[j] equals eq table of t[j:]
    for j in range(1, nv):
        sub = f.decode_mont(FR, mle.eq_table(f.encode_mont(FR, t_ints[j:])))
        assert f.decode_mont(FR, suf[j]) == sub


def test_sum_mod():
    rng = random.Random(3)
    xs = [rng.randrange(hf.R) for _ in range(1 << 7)]
    table = f.encode_mont(FR, xs)
    got = f.decode_mont(FR, mle.sum_mod(table))[0]
    assert got == sum(xs) % hf.R


def test_sum_over_y_matches_rowdot():
    rng = random.Random(4)
    log_n = 5
    n = 1 << log_n
    mat = random_matrix(log_n, 40, rng)
    z_ints = [rng.randrange(hf.R) for _ in range(n)]
    rows, cols, vals = matrix_to_coo(mat)
    coo = (
        jnp.asarray(np.array(rows, np.int32)),
        jnp.asarray(np.array(cols, np.int32)),
        f.encode_mont(FR, vals),
    )
    z = f.encode_mont(FR, z_ints)
    got = f.decode_mont(FR, sparse.sum_over_y(coo, z, n))
    for x in range(n):
        expect = sum(c * z_ints[y] for c, y in mat[x]) % hf.R
        assert got[x] == expect


def test_eval_on_x_boolean_point_reproduces_row():
    # reference test: r1cs_reader.rs test_eval_on_x_sanity
    rng = random.Random(5)
    log_n = 6
    n = 1 << log_n
    mat = random_matrix(log_n, 1 << 9, rng)
    x_point = 0b110010
    rows, cols, vals = matrix_to_coo(mat)
    coo = (
        jnp.asarray(np.array(rows, np.int32)),
        jnp.asarray(np.array(cols, np.int32)),
        f.encode_mont(FR, vals),
    )
    eqx = mle.eq_table(f.encode_mont(FR, bits_to_field_elements(x_point, log_n)))
    got = f.decode_mont(FR, sparse.eval_on_x_table(coo, eqx, n))
    expected_row = {y: c for c, y in mat[x_point]}
    for y in range(n):
        assert got[y] == expected_row.get(y, 0)


def test_dense_segment_two_stage_matches_oracle():
    """Rows/columns with >= 2^16 entries route through the two-stage
    segment sum (ops/sparse.gather_mul_segsum_2stage — the one-stage
    uint32 accumulator would overflow there) and must match the scalar
    oracle exactly. This is the synthesizer's dense-square-row shape at
    2^17+ circuit sizes (reference walks rows/columns with unbounded
    scalar loops, r1cs_reader.rs:75-117)."""
    from spartan_tpu.protocol.indexer import MatrixExtension

    rng = random.Random(11)
    log_n = 6
    n = 1 << log_n
    dense = 1 << 16  # entries in row 0, all hitting column 3
    mat = [[] for _ in range(n)]
    mat[0] = [(rng.randrange(1, hf.R), 3) for _ in range(dense)]
    for x in range(1, n):
        mat[x] = [(rng.randrange(1, hf.R), rng.randrange(n)) for _ in range(2)]
    me = MatrixExtension.new(mat, n)
    assert me.coo[3] is not None and me.coo[4] is not None  # both auxes built

    z_ints = [rng.randrange(hf.R) for _ in range(n)]
    z = f.encode_mont(FR, z_ints)
    got = f.decode_mont(FR, me.sum_over_y(z))
    for x in range(n):
        expect = sum(c * z_ints[y] for c, y in mat[x]) % hf.R
        assert got[x] == expect

    r_x = [rng.randrange(hf.R) for _ in range(log_n)]
    eq_ints = f.decode_mont(FR, mle.eq_table(f.encode_mont(FR, r_x)))
    col_terms = {}
    for x in range(n):
        for c, y in mat[x]:
            col_terms[y] = (col_terms.get(y, 0) + c * eq_ints[x]) % hf.R
    got2 = f.decode_mont(FR, me.eval_on_x(r_x))
    for y in range(n):
        assert got2[y] == col_terms.get(y, 0)


def test_column_density_guard_accepts_under_threshold():
    """Just under the 2^16-nnz column bound must validate, and a circuit with
    a maximally dense column must still prove+verify end-to-end."""
    from spartan_tpu.models.r1cs import validate_matrix
    from spartan_tpu.ops import sparse as sp

    n = 1 << 16
    under = [[(1, 0)] for _ in range(n - 1)] + [[]]
    validate_matrix(under, n)  # must not raise

    # dense-column correctness at a computable size: every row of A hits
    # column 0; sum_over_y(A, z) must equal the dense mat-vec oracle.
    log_n = 5
    m = 1 << log_n
    rng = random.Random(9)
    a = [[(rng.randrange(1, hf.R), 0), (rng.randrange(1, hf.R), i)] for i in range(m)]
    validate_matrix(a, m)
    z_ints = [rng.randrange(hf.R) for _ in range(m)]
    rows, cols, vals = matrix_to_coo(a)
    coo = (
        jnp.asarray(np.array(rows, np.int32)),
        jnp.asarray(np.array(cols, np.int32)),
        f.encode_mont(FR, vals),
    )
    z = f.encode_mont(FR, z_ints)
    got = f.decode_mont(FR, sp.sum_over_y(coo, z, m))
    for x in range(m):
        want = sum(c * z_ints[y] for c, y in a[x]) % hf.R
        assert got[x] == want
