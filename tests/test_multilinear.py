"""MLE engine tests vs naive host-int ground truth (mirrors the algebraic
unit tests at reference poly/multilinear.rs:663-712)."""

import numpy as np
import jax.numpy as jnp

from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.poly.bh import BooleanHypercube

P = Fr.modulus
RNG = np.random.RandomState(7)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def naive_eval(evals, x):
    evals = list(evals)
    for xi in x:
        evals = [((e1 - e0) * xi + e0) % P for e0, e1 in zip(evals[0::2], evals[1::2])]
    return evals[0]


def test_fix_var_and_evaluate():
    for k in [1, 3, 5]:
        vals = rand_fes(1 << k)
        x = rand_fes(k)
        arr = jnp.asarray(Fr.encode(vals))
        xd = jnp.asarray(Fr.encode(x))
        got = int(Fr.decode(np.asarray(mle.evaluate(Fr, arr, xd))[None, :])[0])
        assert got == naive_eval(vals, x)
        # fold one var then evaluate rest
        folded = mle.fix_var(Fr, arr, xd[0])
        got2 = int(Fr.decode(np.asarray(mle.evaluate(Fr, folded, xd[1:]))[None, :])[0])
        assert got2 == naive_eval(vals, x)


def test_fix_last_var():
    k = 4
    vals = rand_fes(1 << k)
    x = rand_fes(1)[0]
    arr = jnp.asarray(Fr.encode(vals))
    xd = jnp.asarray(Fr.encode([x]))[0]
    got = [int(v) for v in Fr.decode(np.asarray(mle.fix_last_var(Fr, arr, xd)))]
    half = 1 << (k - 1)
    expect = [(vals[b] + (vals[b + half] - vals[b]) * x) % P for b in range(half)]
    assert got == expect


def test_eq_xy():
    for k in [1, 2, 4]:
        y = rand_fes(k)
        yd = jnp.asarray(Fr.encode(y))
        table = [int(v) for v in Fr.decode(np.asarray(mle.eq_xy(Fr, yd)))]
        for b in range(1 << k):
            expect = 1
            for i in range(k):
                expect = expect * (y[i] if (b >> i) & 1 else (1 - y[i]) % P) % P
            assert table[b] == expect


def test_eq_xy_matches_doubling_oracle():
    # the shape-uniform scan form must agree with the per-level doubling
    # expansion (multilinear.rs:91-127 semantics) bit for bit
    for k in [1, 3, 6]:
        y = rand_fes(k)
        yd = jnp.asarray(Fr.encode(y))
        a = np.asarray(mle.eq_xy(Fr, yd))
        b = np.asarray(mle._eq_xy_doubling(Fr, yd))
        assert (a == b).all()


def test_eq_xy_eval_host():
    k = 5
    x, y = rand_fes(k), rand_fes(k)
    yd = jnp.asarray(Fr.encode(y))
    table = [int(v) for v in Fr.decode(np.asarray(mle.eq_xy(Fr, yd)))]
    got = mle.eq_xy_eval_host(P, x, y)
    assert got == naive_eval(table, x)


def test_bh_orbit_bijective():
    for k in range(0, 12):
        bh = BooleanHypercube(k)
        seq = bh.iter_indices()
        assert len(set(seq.tolist())) == 1 << k
        # sequential next() agrees with doubling construction
        b = 1
        for i in range(1, min(1 << k, 50)):
            assert seq[i] == b
            b = int(bh.next_idx(np.array([b]))[0])


def test_bh_rotate_roundtrip():
    bh = BooleanHypercube(8)
    idx = np.arange(256)
    fwd = bh.rotate(idx, 3)
    back = bh.rotate(fwd, -3)
    assert np.array_equal(back, idx)


def test_rotation_eval_roundtrip():
    """rotation_eval(x, rot, evaluate_for_rotation(x, rot)) == rotated_poly(x)
    — mirror of multilinear.rs test evaluate_for_rotation."""
    for k in [3, 5]:
        bh = BooleanHypercube(k)
        f = rand_fes(1 << k)
        x = rand_fes(k)

        def rotate_poly(vals, r):
            m = bh.rotation_map(r)
            return [vals[m[b]] for b in range(1 << k)]

        for rot in [-2, -1, 1, 2]:
            arr = jnp.asarray(Fr.encode(f))
            efr = mle.evaluate_for_rotation(Fr, arr, x, rot)
            got = mle.rotation_eval(P, x, rot, efr)
            expect = naive_eval(rotate_poly(f, rot), x)
            assert got == expect, (k, rot)


def test_rotate_evals_gather():
    k = 4
    bh = BooleanHypercube(k)
    f = rand_fes(1 << k)
    arr = jnp.asarray(Fr.encode(f))
    got = [int(v) for v in Fr.decode(np.asarray(mle.rotate_evals(Fr, arr, 1)))]
    m = bh.rotation_map(1)
    assert got == [f[m[b]] for b in range(1 << k)]
