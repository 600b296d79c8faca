"""Folding-scheme helper tests (relaxed.rs semantics).

The load-bearing property of `cross_term_expressions` (relaxed.rs:34-130):
for the homogenized (relaxed) constraint R of folding degree d,

    R(w1 + r*w2, c1 + r*c2, u1 + r*u2)
      = R(lhs) + sum_{j=1}^{d-1} r^j * T_j(lhs, rhs) + r^d * R(rhs)

for every scalar r — i.e. the T_j are exactly the mixed-degree-j terms.
We verify this identity numerically at a point, for several r.
"""

import pytest

from halo2_lasso_tpu.expression import Expression, evaluate_host
from halo2_lasso_tpu.folding import (
    PolynomialSet,
    cross_term_expressions,
    folding_degree,
    products,
    relaxed_expression,
)
from halo2_lasso_tpu.ops.bn254 import Fr

P = Fr.modulus


def _constraint():
    # q * a * b + ch * a + b + 3   (q preprocess; a=1, b=2 folding; one challenge)
    q, a, b = Expression.poly(0), Expression.poly(1), Expression.poly(2)
    return q * a * b + Expression.challenge(0) * a + b + Expression.constant(3)


def test_products_split():
    prods = products({0}, _constraint())
    degs = sorted(p.folding_degree for p in prods)
    # 3 | b | ch*a (challenge is itself a foldee) | q*a*b
    assert degs == [0, 1, 2, 2]
    assert folding_degree(prods) == 2
    # the q*a*b product keeps q in the preprocess factor
    (p2,) = [p for p in prods if p.preprocess.used_poly]
    assert p2.preprocess.used_poly == frozenset({0})
    assert p2.folding_degree == 2


def test_relaxed_expression_homogeneous():
    prods = products({0}, _constraint())
    relaxed = relaxed_expression(prods, u=1)
    # every monomial now has total foldee degree == 2 (u counts as foldee)
    sub = products({0}, relaxed)
    assert {p.folding_degree for p in sub} == {2}


@pytest.mark.parametrize("r", [0, 1, 2, 12345, P - 1])
def test_cross_term_fold_identity(r):
    prods = products({0}, _constraint())
    fd = folding_degree(prods)
    num_challenges = 1
    relaxed = relaxed_expression(prods, u=num_challenges)
    ts = cross_term_expressions(
        PolynomialSet(preprocess={0}, folding={1, 2}), prods, num_challenges
    )
    assert len(ts) == fd - 1

    q_val = 11
    lhs_w = {1: 1234567, 2: 7654321}
    rhs_w = {1: 1111, 2: 999999999}
    lhs_ch = [5, 17]  # [challenge, u]
    rhs_ch = [23, 29]

    def point_eval(expr, w, ch):
        def leaf(kind, arg):
            assert kind == "poly" and arg.rotation == 0
            return q_val if arg.poly == 0 else w[arg.poly]

        return evaluate_host(expr, P, leaf, ch)

    # folded instance
    fold_w = {i: (lhs_w[i] + r * rhs_w[i]) % P for i in (1, 2)}
    fold_ch = [(a + r * b) % P for a, b in zip(lhs_ch, rhs_ch)]
    lhs_val = point_eval(relaxed, lhs_w, lhs_ch)
    rhs_val = point_eval(relaxed, rhs_w, rhs_ch)
    fold_val = point_eval(relaxed, fold_w, fold_ch)

    # cross terms live in the combined space [pre | lhs fold | rhs fold],
    # challenges [lhs ch, lhs u, rhs ch, rhs u]
    comb_w = {0: q_val, 1: lhs_w[1], 2: lhs_w[2], 3: rhs_w[1], 4: rhs_w[2]}
    comb_ch = lhs_ch + rhs_ch

    def comb_eval(expr):
        def leaf(kind, arg):
            assert kind == "poly" and arg.rotation == 0
            return comb_w[arg.poly]

        return evaluate_host(expr, P, leaf, comb_ch)

    expect = lhs_val
    for j, t in enumerate(ts, start=1):
        expect = (expect + pow(r, j, P) * comb_eval(t)) % P
    expect = (expect + pow(r, fd, P) * rhs_val) % P
    assert fold_val == expect


def test_cross_terms_no_constraint():
    assert cross_term_expressions(
        PolynomialSet(preprocess=set(), folding={0}),
        products(set(), Expression.poly(0)),
        0,
    ) == []
