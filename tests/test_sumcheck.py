"""Generic ML sumcheck: prover/verifier round-trip and rejection."""

import random

import pytest

from spartan_tpu.host import field as hf
from spartan_tpu.ops import field as fo
from spartan_tpu.ops.field import FR
from spartan_tpu.protocol import sumcheck as sc
from spartan_tpu.utils.errors import SumCheckError
from spartan_tpu.utils.transcript import Blake2sRng


def _true_sum(products, nv):
    total = 0
    for prod in products:
        for b in range(1 << nv):
            term = 1
            for tab in prod:
                term = term * tab[b] % hf.R
            total = (total + term) % hf.R
    return total


def _run_sumcheck(products_ints, nv, tamper_round=None):
    products_dev = [
        [fo.encode_mont(FR, tab) for tab in prod] for prod in products_ints
    ]
    ps = sc.prover_init(products_dev, nv)
    info = sc.index_info(ps)
    vs = sc.verifier_init(info)
    rng = Blake2sRng.setup()
    rng.feed(b"sumcheck-test")

    v_msg = None
    for rnd in range(nv):
        p_msg = sc.prove_round(ps, v_msg)
        if tamper_round == rnd:
            evs = list(p_msg.evaluations)
            evs[0] = (evs[0] + 1) % hf.R
            p_msg = sc.ProverMsg(evaluations=evs)
        rng.feed(p_msg.serialize())
        v_msg = sc.verify_round(vs, p_msg, rng)
    return ps, vs


def test_sumcheck_roundtrip_single_product():
    rng = random.Random(0)
    nv = 4
    f1 = [rng.randrange(hf.R) for _ in range(1 << nv)]
    f2 = [rng.randrange(hf.R) for _ in range(1 << nv)]
    products = [[f1, f2]]
    ps, vs = _run_sumcheck(products, nv)
    claimed = _true_sum(products, nv)
    sub = sc.check_and_generate_subclaim(vs, claimed)
    # expected_evaluation must equal the combination evaluated at the point
    point = sub.point

    def mle_eval(tab, pt):
        t = list(tab)
        for r in pt:
            t = [(t[2 * b] + r * (t[2 * b + 1] - t[2 * b])) % hf.R for b in range(len(t) // 2)]
        return t[0]

    expect = mle_eval(f1, point) * mle_eval(f2, point) % hf.R
    assert sub.expected_evaluation == expect


def test_sumcheck_roundtrip_multi_product():
    rng = random.Random(1)
    nv = 3
    prods = [
        [[rng.randrange(hf.R) for _ in range(1 << nv)] for _ in range(3)],
        [[rng.randrange(hf.R) for _ in range(1 << nv)] for _ in range(2)],
    ]
    ps, vs = _run_sumcheck(prods, nv)
    claimed = _true_sum(prods, nv)
    sub = sc.check_and_generate_subclaim(vs, claimed)
    assert sub.point  # completed without raising


def test_sumcheck_rejects_wrong_sum():
    rng = random.Random(2)
    nv = 3
    prods = [[[rng.randrange(hf.R) for _ in range(1 << nv)] for _ in range(2)]]
    ps, vs = _run_sumcheck(prods, nv)
    claimed = (_true_sum(prods, nv) + 1) % hf.R
    with pytest.raises(SumCheckError):
        sc.check_and_generate_subclaim(vs, claimed)


def test_sumcheck_rejects_tampered_round():
    rng = random.Random(3)
    nv = 3
    prods = [[[rng.randrange(hf.R) for _ in range(1 << nv)] for _ in range(2)]]
    ps, vs = _run_sumcheck(prods, nv, tamper_round=1)
    claimed = _true_sum(prods, nv)
    with pytest.raises(SumCheckError):
        sc.check_and_generate_subclaim(vs, claimed)


def test_interpolation():
    # poly p(x) = 3x^2 + 2x + 7 from evals at 0,1,2
    p = lambda x: (3 * x * x + 2 * x + 7) % hf.R
    evals = [p(0), p(1), p(2)]
    r = 123456789
    assert sc.interpolate_uni_poly(evals, r) == p(r)
