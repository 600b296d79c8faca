"""Batched-affine MSM (ops/msm_affine.py) vs the portable Pippenger path.

Covers the affine edge cases the halving tree must select around: duplicate
points (doubling lanes), opposite points (cancellation), zero scalars and
identity inputs (infinity lanes), and digit-0 masking.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from halo2_lasso_tpu.ops import ec, msm_affine
from halo2_lasso_tpu.ops.bn254 import Fr

P = Fr.modulus
RNG = np.random.RandomState(3)


def rand_points(n, dup=False):
    ms = RNG.randint(1, 1 << 30, size=n).astype(np.uint64)
    if dup:
        ms[:] = ms[0]
    msc = jnp.asarray(Fr.encode([int(v) for v in ms]))
    return ec.fixed_base_msm(ec.g1_generator(), msc, 30)


def run(n, dup=False, zeros=False):
    pts = rand_points(n, dup)
    sc = [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]
    if zeros:
        for i in range(0, n, 3):
            sc[i] = 0
    scal = jnp.asarray(Fr.encode(sc))
    ref = ec.variable_base_msm(pts, scal)
    got = msm_affine.msm_affine(pts, scal)
    ra = ec.jacobian_to_affine({k: v[None] for k, v in ref.items()})
    ga = ec.jacobian_to_affine({k: v[None] for k, v in got.items()})
    assert (ra == ga).all()


def test_basic():
    run(256)


def test_duplicate_points():
    run(256, dup=True)


def test_zero_scalars():
    run(256, zeros=True)


def test_opposite_points_cancel():
    # P and -P with equal scalars: forces cancellation lanes
    pts = rand_points(4)
    neg = ec.ec_neg(pts)
    both = {k: jnp.concatenate([pts[k], neg[k]]) for k in pts}
    sc = [5, 7, 11, 13] * 2
    scal = jnp.asarray(Fr.encode(sc))
    ref = ec.variable_base_msm(both, scal)
    got = msm_affine.msm_affine(both, scal)
    ra = ec.jacobian_to_affine({k: v[None] for k, v in ref.items()})
    ga = ec.jacobian_to_affine({k: v[None] for k, v in got.items()})
    assert (ra == ga).all()


@pytest.mark.parametrize("m", [64, 2048, 4096, 12288, 2816])
def test_batch_inv_lanes(m):
    """Chunked Montgomery batch inversion (the accelerator path of
    batch_inv_lf): a * inv(a) == 1 across the base (<= _INV_SCAN_BASE),
    chunked (T=64 recursion), and non-power-of-two (12288 = 3*2^12,
    2816 = 11*2^8) shapes the halving-tree levels produce."""
    from halo2_lasso_tpu.ops.bn254 import Fq

    vals = [
        (int.from_bytes(RNG.bytes(40), "little") % (Fq.modulus - 1)) + 1
        for _ in range(m)
    ]
    a = jnp.transpose(jnp.asarray(Fq.encode(vals)), (1, 0))  # (L, m)
    inv = msm_affine._batch_inv_lanes(a, Fq)
    prod = msm_affine.mul_lf_traced(a, inv, Fq)
    assert (np.asarray(prod) == np.asarray(msm_affine._one_lf(m, Fq))).all()
