"""Grumpkin (the BN254 2-cycle partner, curves.rs / hyperplonk.rs:422-423):
device EC ops + MSM over base field Fr, and the IPA PCS with polynomials
over the grumpkin scalar field (bn254 Fq)."""

import numpy as np
import pytest

from halo2_lasso_tpu.errors import Halo2LassoError

import jax.numpy as jnp

from halo2_lasso_tpu.ops import curves, ec, field as F, msm_affine
from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, FR_MODULUS, Fq, Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.pcs.ipa import MultilinearIpaGrumpkin
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript

G = curves.GRUMPKIN
ORDER = G.scalar.modulus  # == FQ_MODULUS
RNG = np.random.RandomState(11)


def _smul(pt, k):
    can = jnp.asarray(
        np.asarray([[(k >> (16 * i)) & 0xFFFF for i in range(16)]], dtype=np.uint32)
    )
    bits = ec.scalars_to_bits(can, 256)
    return ec.scalar_mul_bits({kk: v[None] for kk, v in pt.items()}, bits, G.base)


def test_generator_on_curve():
    assert curves.on_curve(G, *G.generator)


def test_scalar_mul_linearity():
    g = ec.curve_generator(G)
    a, b = 123456789, 987654321
    s = ec.ec_add(_smul(g, a), _smul(g, b), G.base)
    aff_s = ec.jacobian_to_affine(s, G.base)
    aff_ab = ec.jacobian_to_affine(_smul(g, (a + b) % ORDER), G.base)
    assert (aff_s == aff_ab).all()
    assert curves.on_curve(G, int(aff_s[0, 0]), int(aff_s[0, 1]))


def test_grumpkin_msm_matches_small_path():
    g = ec.curve_generator(G)
    n = 256
    ms = [int(v) for v in RNG.randint(1, 1 << 30, size=n)]
    pts = ec.fixed_base_msm(g, jnp.asarray(G.scalar.encode(ms)), 30, G.base, G.scalar)
    sc = [int.from_bytes(RNG.bytes(40), "little") % ORDER for _ in range(n)]
    scal = jnp.asarray(G.scalar.encode(sc))
    got = msm_affine.msm_affine(pts, scal, G.base, G.scalar)
    ref = ec._msm_small(
        pts, F.from_mont(G.scalar, scal)[None], G.base, G.scalar.num_bits
    )
    ga = ec.jacobian_to_affine({k: v[None] for k, v in got.items()}, G.base)
    ra = ec.jacobian_to_affine({k: v[None] for k, v in ref.items()}, G.base)
    assert (ga == ra[:, 0] if ra.ndim == 3 else ga == ra).all()


def new_t(proof=None):
    # challenges/field elements over grumpkin's scalar field Fq; point
    # coordinates over its base field Fr with b = -17
    return Keccak256Transcript(
        FQ_MODULUS, base_modulus=FR_MODULUS, proof=proof, curve_b=curves.GRUMPKIN_B
    )


def test_ipa_grumpkin_roundtrip():
    num_vars = 3
    S = Fq
    param = MultilinearIpaGrumpkin.setup(1 << num_vars)
    pp, vp = MultilinearIpaGrumpkin.trim(param, 1 << num_vars)
    vals = [int.from_bytes(RNG.bytes(40), "little") % ORDER for _ in range(1 << num_vars)]
    poly = jnp.asarray(S.encode(vals))

    tw = new_t()
    comm = MultilinearIpaGrumpkin.commit(pp, poly)
    assert curves.on_curve(G, *comm)
    tw.write_commitment(comm)
    point = tw.squeeze_challenges(num_vars)
    v = F.decode_scalar(
        S, np.asarray(mle.evaluate(S, poly, jnp.asarray(S.encode(point))))
    )
    tw.write_field_element(v)
    MultilinearIpaGrumpkin.open(pp, poly, point, v, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comm_r = tr.read_commitment()
    point_r = tr.squeeze_challenges(num_vars)
    v_r = tr.read_field_element()
    MultilinearIpaGrumpkin.verify(vp, comm_r, point_r, v_r, tr)

    tr2 = new_t(proof)
    tr2.read_commitment()
    pt2 = tr2.squeeze_challenges(num_vars)
    tr2.read_field_element()
    with pytest.raises(Halo2LassoError):
        MultilinearIpaGrumpkin.verify(vp, comm_r, pt2, (v_r + 1) % ORDER, tr2)


def test_hyrax_grumpkin_roundtrip():
    from halo2_lasso_tpu.pcs.hyrax import MultilinearHyraxGrumpkin

    num_vars = 4
    S = Fq
    param = MultilinearHyraxGrumpkin.setup(1 << num_vars)
    pp, vp = MultilinearHyraxGrumpkin.trim(param, 1 << num_vars)
    vals = [int.from_bytes(RNG.bytes(40), "little") % ORDER for _ in range(1 << num_vars)]
    poly = jnp.asarray(S.encode(vals))

    tw = new_t()
    comm = MultilinearHyraxGrumpkin.commit(pp, poly)
    for c in comm:
        assert curves.on_curve(G, *c)
    tw.write_commitments(comm)
    point = tw.squeeze_challenges(num_vars)
    v = F.decode_scalar(
        S, np.asarray(mle.evaluate(S, poly, jnp.asarray(S.encode(point))))
    )
    tw.write_field_element(v)
    MultilinearHyraxGrumpkin.open(pp, poly, point, v, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comm_r = tr.read_commitments(len(comm))
    point_r = tr.squeeze_challenges(num_vars)
    v_r = tr.read_field_element()
    MultilinearHyraxGrumpkin.verify(vp, comm_r, point_r, v_r, tr)

    tr2 = new_t(proof)
    tr2.read_commitments(len(comm))
    pt2 = tr2.squeeze_challenges(num_vars)
    tr2.read_field_element()
    with pytest.raises(Halo2LassoError):
        MultilinearHyraxGrumpkin.verify(vp, comm_r, pt2, (v_r + 1) % ORDER, tr2)
