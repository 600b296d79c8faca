"""Pasta 2-cycle (pallas/vesta, curves.py catalog): the generic EC/MSM/IPA
layers instantiated over a non-BN254 field pair."""

import numpy as np
import pytest

import jax.numpy as jnp

from halo2_lasso_tpu.ops import curves, ec, field as F, msm_affine
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript

C = curves.PALLAS
ORDER = C.scalar.modulus
RNG = np.random.RandomState(13)


def _smul(pt, k):
    can = jnp.asarray(
        np.asarray([[(k >> (16 * i)) & 0xFFFF for i in range(16)]], dtype=np.uint32)
    )
    bits = ec.scalars_to_bits(can, 256)
    return ec.scalar_mul_bits({kk: v[None] for kk, v in pt.items()}, bits, C.base)


def test_pallas_generator_on_curve():
    assert curves.on_curve(C, *C.generator)


def test_pallas_scalar_mul_linearity():
    g = ec.curve_generator(C)
    a, b = 55555333, 777799911
    s = ec.ec_add(_smul(g, a), _smul(g, b), C.base)
    aff_s = ec.jacobian_to_affine(s, C.base)
    aff_ab = ec.jacobian_to_affine(_smul(g, (a + b) % ORDER), C.base)
    assert (aff_s == aff_ab).all()
    assert curves.on_curve(C, int(aff_s[0, 0]), int(aff_s[0, 1]))


def test_pallas_msm_matches_small_path():
    g = ec.curve_generator(C)
    n = 256
    ms = [int(v) for v in RNG.randint(1, 1 << 30, size=n)]
    pts = ec.fixed_base_msm(g, jnp.asarray(C.scalar.encode(ms)), 30, C.base, C.scalar)
    sc = [int.from_bytes(RNG.bytes(40), "little") % ORDER for _ in range(n)]
    scal = jnp.asarray(C.scalar.encode(sc))
    got = msm_affine.msm_affine(pts, scal, C.base, C.scalar)
    ref = ec._msm_small(
        pts, F.from_mont(C.scalar, scal)[None], C.base, C.scalar.num_bits
    )
    ga = ec.jacobian_to_affine({k: v[None] for k, v in got.items()}, C.base)
    ra = ec.jacobian_to_affine({k: v[None] for k, v in ref.items()}, C.base)
    assert (ga == ra).all()
    assert curves.on_curve(C, int(ga[0, 0]), int(ga[0, 1]))


def test_vesta_cycle_pairing():
    """TwoChainCurve: vesta's base field is pallas' scalar field and vice
    versa (util/arithmetic.rs:37-59)."""
    V = curves.VESTA
    assert V.base is C.scalar and V.scalar is C.base
    assert curves.TWO_CHAIN["pallas"] is V and curves.TWO_CHAIN["vesta"] is C
    assert curves.on_curve(V, *V.generator)
    g = ec.curve_generator(V)
    d = ec.ec_double(g, V.base)
    aff = ec.jacobian_to_affine({k: v[None] for k, v in d.items()}, V.base)
    assert curves.on_curve(V, int(aff[0, 0]), int(aff[0, 1]))
