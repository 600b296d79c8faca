"""Univariate polynomial + univariate KZG tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.pcs.multilinear_kzg import PcsError
from halo2_lasso_tpu.pcs.univariate_kzg import UnivariateKzg
from halo2_lasso_tpu.poly import univariate as uni
from halo2_lasso_tpu.transcript import Keccak256Transcript

P = Fr.modulus
RNG = np.random.RandomState(13)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def new_t(proof=None):
    return Keccak256Transcript(P, base_modulus=FQ_MODULUS, proof=proof, curve_b=3)


def test_evaluate_and_divide():
    coeffs = rand_fes(17)
    x = rand_fes(1)[0]
    cd = jnp.asarray(Fr.encode(coeffs))
    xd = jnp.asarray(Fr.encode([x]))[0]
    got = F.decode_scalar(Fr, np.asarray(uni.evaluate(Fr, cd, xd)))
    assert got == uni.evaluate_host(P, coeffs, x)

    q, r = uni.div_by_linear(Fr, cd, xd)
    assert F.decode_scalar(Fr, np.asarray(r)) == got  # remainder = f(z)
    q_ints = [int(v) for v in Fr.decode(np.asarray(q))]
    # check f = q*(X-z) + r
    recon = [(-x * q_ints[0]) % P] + [
        (q_ints[i - 1] - x * q_ints[i]) % P for i in range(1, len(q_ints))
    ] + [q_ints[-1]]
    recon[0] = (recon[0] + got) % P
    assert recon == coeffs


def test_div_rem_by_vanishing():
    coeffs = rand_fes(16)
    roots = rand_fes(3)
    cd = jnp.asarray(Fr.encode(coeffs))
    q, rem = uni.div_rem_by_vanishing(Fr, cd, roots)
    # f(root) == rem(root) for each root
    rem_ints = [int(v) for v in Fr.decode(np.asarray(rem))]
    for rt in roots:
        assert uni.evaluate_host(P, coeffs, rt) == uni.evaluate_host(P, rem_ints, rt)


def test_unikzg_commit_open_verify():
    n = 16
    param = UnivariateKzg.setup(n, np.random.RandomState(9))
    pp, vp = UnivariateKzg.trim(param, n)
    coeffs = rand_fes(n)
    cd = jnp.asarray(Fr.encode(coeffs))

    tw = new_t()
    comm = UnivariateKzg.commit(pp, cd)
    tw.write_commitment(comm)
    z = tw.squeeze_challenge()
    ev = uni.evaluate_host(P, coeffs, z)
    tw.write_field_element(ev)
    UnivariateKzg.open(pp, cd, z, ev, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comm_r = tr.read_commitment()
    z_r = tr.squeeze_challenge()
    ev_r = tr.read_field_element()
    UnivariateKzg.verify(vp, comm_r, z_r, ev_r, tr)

    tr2 = new_t(proof)
    tr2.read_commitment()
    tr2.squeeze_challenge()
    tr2.read_field_element()
    with pytest.raises(PcsError):
        UnivariateKzg.verify(vp, comm_r, z_r, (ev_r + 1) % P, tr2)


def test_unikzg_batch():
    n = 8
    param = UnivariateKzg.setup(n, np.random.RandomState(11))
    pp, vp = UnivariateKzg.trim(param, n)
    polys_c = [rand_fes(n) for _ in range(3)]
    polys = [jnp.asarray(Fr.encode(c)) for c in polys_c]

    tw = new_t()
    comms = [UnivariateKzg.commit(pp, c) for c in polys]
    tw.write_commitments(comms)
    points = [tw.squeeze_challenge() for _ in range(2)]
    pairs = [(0, 0), (0, 1), (1, 0), (2, 1)]
    evals = [
        Evaluation(pi, ti, uni.evaluate_host(P, polys_c[pi], points[ti]))
        for pi, ti in pairs
    ]
    tw.write_field_elements([e.value for e in evals])
    UnivariateKzg.batch_open(pp, polys, points, evals, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comms_r = tr.read_commitments(3)
    points_r = [tr.squeeze_challenge() for _ in range(2)]
    vals = tr.read_field_elements(len(evals))
    evals_r = [Evaluation(e.poly, e.point, v) for e, v in zip(evals, vals)]
    UnivariateKzg.batch_verify(vp, comms_r, points_r, evals_r, tr)
