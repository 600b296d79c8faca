"""Pure-Jacobian halving-tree MSM (ops/msm_jacobian.py) vs the portable
Pippenger path — same edge-case matrix as test_msm_affine.py (duplicates,
cancellations, zero scalars, identity inputs) plus the grumpkin curve swap.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from halo2_lasso_tpu.ops import ec, msm_jacobian
from halo2_lasso_tpu.ops.bn254 import Fr

P = Fr.modulus
RNG = np.random.RandomState(7)


def rand_points(n, dup=False):
    ms = RNG.randint(1, 1 << 30, size=n).astype(np.uint64)
    if dup:
        ms[:] = ms[0]
    msc = jnp.asarray(Fr.encode([int(v) for v in ms]))
    return ec.fixed_base_msm(ec.g1_generator(), msc, 30)


def check(pts, scal):
    ref = ec.variable_base_msm(pts, scal)
    got = msm_jacobian.msm(pts, scal)
    ra = ec.jacobian_to_affine({k: v[None] for k, v in ref.items()})
    ga = ec.jacobian_to_affine({k: v[None] for k, v in got.items()})
    assert (ra == ga).all()


def run(n, dup=False, zeros=False):
    pts = rand_points(n, dup)
    sc = [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]
    if zeros:
        for i in range(0, n, 3):
            sc[i] = 0
    check(pts, jnp.asarray(Fr.encode(sc)))


def test_basic():
    run(256)


def test_duplicate_points():
    run(256, dup=True)


def test_zero_scalars():
    run(256, zeros=True)


def test_opposite_points_cancel():
    pts = rand_points(4)
    neg = ec.ec_neg(pts)
    both = {k: jnp.concatenate([pts[k], neg[k]]) for k in pts}
    scal = jnp.asarray(Fr.encode([5, 7, 11, 13] * 2))
    check(both, scal)


def test_identity_inputs():
    pts = rand_points(8)
    idp = ec.identity_point((4,))
    mixed = {k: jnp.concatenate([pts[k][:4], idp[k]]) for k in pts}
    sc = [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(8)]
    check(mixed, jnp.asarray(Fr.encode(sc)))


def test_grumpkin():
    from halo2_lasso_tpu.ops import curves

    G = curves.GRUMPKIN
    g = ec.curve_generator(G)
    ms = [int(v) for v in RNG.randint(1, 1 << 30, size=16)]
    pts = ec.fixed_base_msm(g, jnp.asarray(G.scalar.encode(ms)), 30, G.base, G.scalar)
    sc = [int.from_bytes(RNG.bytes(40), "little") % G.scalar.modulus for _ in range(16)]
    scal = jnp.asarray(G.scalar.encode(sc))
    ref = ec.variable_base_msm(pts, scal, base=G.base, scalar=G.scalar)
    got = msm_jacobian.msm(pts, scal, base=G.base, scalar=G.scalar)
    ra = ec.jacobian_to_affine({k: v[None] for k, v in ref.items()}, spec=G.base)
    ga = ec.jacobian_to_affine({k: v[None] for k, v in got.items()}, spec=G.base)
    assert (ra == ga).all()


def test_msm_list_segmented_grouping(monkeypatch):
    """msm_list_to_affine_int groups mixed-size jobs into segmented
    pipelines (S*W windows, ec.py LANE_BUDGET grouping); results must equal
    per-job reference MSMs. Mirrors the KZG quotient-open shape (one MSM
    per variable, descending sizes + small tail). Grouping is default-off
    (axon compile cost); force it on here."""
    monkeypatch.setenv("HALO2_LASSO_TPU_MSM_GROUP_LANES", str(4 << 20))
    sizes = [2048, 1024, 1024, 256, 16]
    jobs = []
    for i, n in enumerate(sizes):
        pts = rand_points(n)
        sc = [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]
        if i == 2:
            sc = [0] * n  # an all-zero segment -> identity commitment
        jobs.append((pts, jnp.asarray(Fr.encode(sc))))
    got = ec.msm_list_to_affine_int(jobs)
    for (pts, scal), out in zip(jobs, got):
        ref = ec.msm_to_affine_int(pts, scal)
        assert out == ref
