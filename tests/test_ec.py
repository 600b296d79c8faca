"""G1 group ops + MSM tests vs a host python-int affine implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_lasso_tpu.ops import ec
from halo2_lasso_tpu.ops.bn254 import Fq, Fr, G1_GEN

P = Fq.modulus
R = Fr.modulus
RNG = np.random.RandomState(42)


# ---- host ground truth (affine, python ints; (None) = identity) ----

def h_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    (x1, y1), (x2, y2) = a, b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def h_mul(pt, k):
    acc = None
    while k:
        if k & 1:
            acc = h_add(acc, pt)
        pt = h_add(pt, pt)
        k >>= 1
    return acc


def to_xy(pt):
    return (0, 0) if pt is None else pt


def rand_points(n):
    """n random curve points as affine int pairs (host), via random scalars."""
    pts = []
    for _ in range(n):
        k = int.from_bytes(RNG.bytes(32), "little") % R
        pts.append(h_mul(G1_GEN, k) if k else None)
    return pts


def test_add_double_identity():
    g = G1_GEN
    g2 = h_mul(g, 2)
    g3 = h_mul(g, 3)
    pts_a = np.array([list(g), list(g), list(to_xy(g2)), [0, 0]], dtype=object)
    pts_b = np.array([list(g), list(to_xy(g2)), [0, 0], [0, 0]], dtype=object)
    A = ec.affine_to_jacobian(pts_a)
    B = ec.affine_to_jacobian(pts_b)
    out = ec.jacobian_to_affine(ec.ec_add(A, B))
    expect = [to_xy(g2), to_xy(g3), to_xy(g2), (0, 0)]
    got = [(int(out[i, 0]), int(out[i, 1])) for i in range(4)]
    assert got == expect
    # p + (-p) = O
    negb = ec.ec_neg(A)
    out2 = ec.jacobian_to_affine(ec.ec_add(A, negb))
    assert all(int(out2[i, 0]) == 0 and int(out2[i, 1]) == 0 for i in range(4))


def test_scalar_mul_matches_host():
    ks = [0, 1, 2, 5, 12345, R - 1]
    scal = jnp.asarray(Fr.encode(ks))
    base = ec.g1_generator()
    out_pts = ec.fixed_base_msm(base, scal, 256)
    out = ec.jacobian_to_affine(out_pts)
    for i, k in enumerate(ks):
        assert (int(out[i, 0]), int(out[i, 1])) == to_xy(h_mul(G1_GEN, k)), k


@pytest.mark.parametrize("n", [1, 7, 40])
def test_msm_matches_host(n):
    pts = rand_points(n)
    ks = [int.from_bytes(RNG.bytes(32), "little") % R for _ in range(n)]
    expect = None
    for pt, k in zip(pts, ks):
        if pt is not None:
            expect = h_add(expect, h_mul(pt, k))
    pts_arr = np.array([list(to_xy(pt)) for pt in pts], dtype=object)
    A = ec.affine_to_jacobian(pts_arr)
    scal = jnp.asarray(Fr.encode(ks))
    got = ec.msm_to_affine_int(A, scal)
    assert got == to_xy(expect)


def test_tree_reduce():
    pts = rand_points(9)
    expect = None
    for pt in pts:
        expect = h_add(expect, pt)
    A = ec.affine_to_jacobian(np.array([list(to_xy(p)) for p in pts], dtype=object))
    got = ec.jacobian_to_affine({k: v[None] for k, v in ec.tree_reduce_add(A).items()})
    assert (int(got[0, 0]), int(got[0, 1])) == to_xy(expect)
