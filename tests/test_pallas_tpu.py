"""TPU-only tests for the Pallas fast paths (skipped on CPU, where conftest
pins JAX_PLATFORMS=cpu): the Pallas kernels must agree with the portable
jnp path bit-exactly — round message, fold, full sumcheck proof bytes
(including the transition below the Pallas size threshold), and the MSM.

Run on the axon TPU machine with:
    HALO2_LASSO_TPU_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py
(the env flag lifts conftest's CPU pin for this process; see conftest.py).
bench.py --selftest runs the same checks and records the result in the
driver's BENCH artifact.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="Pallas TPU kernels require an accelerator",
)

import jax.numpy as jnp  # noqa: E402

from halo2_lasso_tpu.ops.bn254 import Fr  # noqa: E402

P = Fr.modulus
RNG = np.random.RandomState(77)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def _flagship(k):
    from __graft_entry__ import _flagship_round

    return _flagship_round(k)


def test_pallas_round_message_matches_jnp():
    from halo2_lasso_tpu.expression import evaluate_jnp
    from halo2_lasso_tpu.ops import field as F
    from halo2_lasso_tpu.ops import pallas_field as PF

    expression, arrays, _ = _flagship(10)
    keys = list(arrays.keys())
    degree = expression.degree
    tables = {k: PF.to_lf(v) for k, v in arrays.items()}
    rf = PF.make_sumcheck_round(Fr, expression, keys, degree, include_fold=False)
    msg, _ = rf(tables, None, None)
    got = [int(v) for v in Fr.decode(np.asarray(msg))]

    def leaf(values):
        def f(kind, arg):
            if kind == "eq_xy":
                return values[("eq", arg)]
            return values[("poly", arg.poly, arg.rotation)]

        return f

    e1 = {k: v[1::2] for k, v in arrays.items()}
    step = {k: F.sub(Fr, e1[k], arrays[k][0::2]) for k in arrays}
    expect = []
    values = e1
    for t in range(1, degree + 1):
        if t > 1:
            values = {k: F.add(Fr, values[k], step[k]) for k in values}
        term = evaluate_jnp(Fr, expression, leaf(values), [])
        expect.append(int(Fr.decode(np.asarray(F.sum_reduce(Fr, term))[None])[0]))
    assert got == expect


def test_pallas_fold_matches_jnp():
    from halo2_lasso_tpu.ops import pallas_field as PF
    from halo2_lasso_tpu.poly import multilinear as mle

    _, arrays, challenge = _flagship(10)
    keys = list(arrays.keys())
    tables = {k: PF.to_lf(v) for k, v in arrays.items()}
    ffn = PF.make_fold_all(Fr, keys)
    folded_lf = ffn(tables, challenge[:, None])
    for k in keys:
        expect = np.asarray(mle.fix_var(Fr, arrays[k], challenge))
        got = np.asarray(PF.from_lf(folded_lf[k]))
        assert np.array_equal(got, expect), k


def test_full_sumcheck_proof_byte_equal_across_paths():
    """sum_check.prove with the Pallas fast path enabled vs disabled must
    emit identical proof bytes — including rounds below PALLAS_MIN where the
    prover transitions from limbs-first Pallas state back to the jnp path."""
    from halo2_lasso_tpu.expression import Expression
    from halo2_lasso_tpu.piop import sum_check
    from halo2_lasso_tpu.poly import multilinear as mle
    from halo2_lasso_tpu.transcript import Keccak256Transcript
    from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS

    k = 13  # > log2(PALLAS_MIN): exercises the fast path AND the transition
    e = (
        Expression.poly(0) * Expression.poly(1) + Expression.poly(2)
    ) * Expression.eq_xy(0)
    polys = [jnp.asarray(Fr.encode(rand_fes(1 << k))) for _ in range(3)]
    y = rand_fes(k)

    # claimed sum over the hypercube
    from halo2_lasso_tpu.ops import field as F

    eq = mle.eq_xy(Fr, jnp.asarray(Fr.encode(y)))
    term = F.add(Fr, F.mont_mul(Fr, polys[0], polys[1]), polys[2])
    s = int(Fr.decode(np.asarray(F.sum_reduce(Fr, F.mont_mul(Fr, term, eq)))[None])[0])

    def run():
        tw = Keccak256Transcript(P, base_modulus=FQ_MODULUS, curve_b=3)
        vp = sum_check.VirtualPolynomial(e, polys, [], [y])
        sum_check.prove(Fr, k, vp, s, tw)
        return tw.into_proof()

    os.environ["HALO2_LASSO_TPU_PALLAS"] = "1"
    proof_pallas = run()
    os.environ["HALO2_LASSO_TPU_PALLAS"] = "0"
    try:
        proof_jnp = run()
    finally:
        os.environ["HALO2_LASSO_TPU_PALLAS"] = "1"
    assert proof_pallas == proof_jnp


def test_pallas_msm_matches_jnp():
    from halo2_lasso_tpu.ops import ec, field as F
    from halo2_lasso_tpu.ops import pallas_ec

    n = 1 << 10
    ms = jnp.asarray(Fr.encode(rand_fes(n)))
    pts = ec.fixed_base_msm(ec.g1_generator(), ms, 256)
    scalars = jnp.asarray(Fr.encode(rand_fes(n)))
    got = ec.jacobian_to_affine(
        {k: v[None] for k, v in pallas_ec.msm_pallas(pts, scalars).items()}
    )
    scal_can = F.from_mont(Fr, scalars)
    expect = ec.jacobian_to_affine(
        {k: v[None] for k, v in ec._msm_impl(pts, scal_can, 16).items()}
    )
    assert (int(got[0, 0]), int(got[0, 1])) == (int(expect[0, 0]), int(expect[0, 1]))


def test_msm_affine_matches_jnp_on_chip():
    """Production batched-affine MSM (gen-3) on-chip parity with the
    portable Pippenger — covers the merged pair/flush add, the chunked
    batch inversion, and the tile-guarded pallas mul dispatch at level
    shapes whose sublane-row counts are not TILE_S-aligned."""
    from halo2_lasso_tpu.ops import ec, field as F, msm_affine

    n = 1 << 12
    ms = jnp.asarray(Fr.encode(rand_fes(n)))
    pts = ec.fixed_base_msm(ec.g1_generator(), ms, 256)
    scalars = jnp.asarray(Fr.encode(rand_fes(n)))
    got = ec.jacobian_to_affine(
        {k: v[None] for k, v in msm_affine.msm_affine(pts, scalars).items()}
    )
    scal_can = F.from_mont(Fr, scalars)
    expect = ec.jacobian_to_affine(
        {k: v[None] for k, v in ec._msm_impl(pts, scal_can, 16).items()}
    )
    assert (int(got[0, 0]), int(got[0, 1])) == (int(expect[0, 0]), int(expect[0, 1]))
