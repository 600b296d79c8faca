"""Sumcheck round-trip tests (mirror of reference piop/sum_check.rs test
harness `run_sum_check`): prove over random polys, re-verify from the proof
bytes, and check the final claim against independent poly evaluations."""

import numpy as np
import jax.numpy as jnp

from halo2_lasso_tpu.expression import Expression, Query
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.piop import sum_check
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.poly.bh import BooleanHypercube
from halo2_lasso_tpu.transcript import Keccak256Transcript

P = Fr.modulus
RNG = np.random.RandomState(99)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def run_sum_check(num_vars, expression, poly_values, challenges, y):
    """prove -> verify -> final-claim check; returns nothing, asserts."""
    polys = [jnp.asarray(Fr.encode(v)) for v in poly_values]
    vp = sum_check.VirtualPolynomial(expression, polys, challenges, [y])

    # host ground-truth hypercube sum
    bh = BooleanHypercube(num_vars)
    rot_maps = {r: bh.rotation_map(r) for r in expression.used_rotation}
    eq_table = None
    if expression.used_eq_xy:
        yd = jnp.asarray(Fr.encode(y))
        eq_table = [int(v) for v in Fr.decode(np.asarray(mle.eq_xy(Fr, yd)))]
    bh_seq = bh.iter_indices()

    from halo2_lasso_tpu.expression import evaluate_host

    def host_sum():
        total = 0
        for b in range(1 << num_vars):
            def leaf(kind, arg):
                if kind == "poly":
                    return poly_values[arg.poly][rot_maps[arg.rotation][b]]
                if kind == "eq_xy":
                    return eq_table[b]
                if kind == "identity":
                    return b
                if kind == "lagrange":
                    return 1 if b == int(bh_seq[arg % (1 << num_vars)]) else 0
                raise ValueError(kind)

            total = (total + evaluate_host(expression, P, leaf, challenges)) % P
        return total

    claimed = host_sum()

    tw = Keccak256Transcript(P)
    chals, final_evals = sum_check.prove(Fr, num_vars, vp, claimed, tw)
    proof = tw.into_proof()

    tr = Keccak256Transcript(P, proof=proof)
    x_eval, x = sum_check.verify(P, num_vars, expression.degree, claimed, tr)
    assert x == chals

    # independent evaluation of all queried polys at x (with rotations)
    evals = {}
    for q in expression.used_query:
        arr = jnp.asarray(Fr.encode(poly_values[q.poly]))
        efr = mle.evaluate_for_rotation(Fr, arr, x, q.rotation)
        evals[q] = mle.rotation_eval(P, x, q.rotation, efr)
        if q.rotation == 0:
            assert evals[q] == final_evals[q.poly]

    expect = sum_check.evaluate_at_point(
        expression, P, num_vars, evals, challenges, [y], x
    )
    assert x_eval == expect


def test_degree2_basic():
    k = 4
    # expr = eq * (p0 * p1 + challenge * p2)
    e = Expression.eq_xy(0) * (
        Expression.poly(0) * Expression.poly(1)
        + Expression.challenge(0) * Expression.poly(2)
    )
    polys = [rand_fes(1 << k) for _ in range(3)]
    run_sum_check(k, e, polys, rand_fes(1), rand_fes(k))


def test_with_rotation():
    k = 5
    # expr = eq * (p0(X) * p1(next(X)) - p1(prev(X)))
    e = Expression.eq_xy(0) * (
        Expression.poly(0) * Expression.poly(1, 1) - Expression.poly(1, -1)
    )
    polys = [rand_fes(1 << k) for _ in range(2)]
    run_sum_check(k, e, polys, rand_fes(1), rand_fes(k))


def test_with_lagrange_and_identity():
    k = 3
    e = Expression.eq_xy(0) * (
        Expression.lagrange(1) * Expression.poly(0) + Expression.identity()
    ) + Expression.poly(1) * Expression.poly(1)
    polys = [rand_fes(1 << k) for _ in range(2)]
    run_sum_check(k, e, polys, rand_fes(1), rand_fes(k))


def test_distribute_powers_zero_check():
    k = 4
    gates = [
        Expression.poly(0) * Expression.poly(1) - Expression.poly(2),
        Expression.poly(0) - Expression.poly(1),
    ]
    alpha = Expression.challenge(0)
    e = Expression.distribute_powers(gates, alpha) * Expression.eq_xy(0)
    a = rand_fes(1 << k)
    polys = [a, a, [ai * ai % P for ai in a]]  # satisfies both gates
    challenges = rand_fes(1)
    run_sum_check(k, e, polys, challenges, rand_fes(k))
