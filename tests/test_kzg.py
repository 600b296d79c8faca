"""Multilinear KZG commit/open/verify round trips (mirror of the reference
PCS shared harness, pcs/multilinear.rs:293-406, at reduced sizes for CI)."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg, PcsError
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript

from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS

P = Fr.modulus
RNG = np.random.RandomState(5)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def new_t(proof=None):
    return Keccak256Transcript(P, base_modulus=FQ_MODULUS, proof=proof, curve_b=3)


@pytest.mark.parametrize("num_vars", [3, 5])
def test_commit_open_verify(num_vars):
    param = MultilinearKzg.setup(1 << num_vars, np.random.RandomState(17))
    pp, vp = MultilinearKzg.trim(param, 1 << num_vars)

    vals = rand_fes(1 << num_vars)
    poly = jnp.asarray(Fr.encode(vals))

    tw = new_t()
    comm = MultilinearKzg.commit(pp, poly)
    tw.write_commitment(comm)
    point = tw.squeeze_challenges(num_vars)
    xd = jnp.asarray(Fr.encode(point))
    eval_ = int(Fr.decode(np.asarray(mle.evaluate(Fr, poly, xd))[None])[0])
    tw.write_field_element(eval_)
    MultilinearKzg.open(pp, poly, point, eval_, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comm_r = tr.read_commitment()
    point_r = tr.squeeze_challenges(num_vars)
    eval_r = tr.read_field_element()
    assert comm_r == comm and point_r == point and eval_r == eval_
    MultilinearKzg.verify(vp, comm_r, point_r, eval_r, tr)

    # tampered eval must fail
    tr2 = new_t(proof)
    c2 = tr2.read_commitment()
    pt2 = tr2.squeeze_challenges(num_vars)
    _ = tr2.read_field_element()
    with pytest.raises(PcsError):
        MultilinearKzg.verify(vp, c2, pt2, (eval_ + 1) % P, tr2)


def test_batch_commit_open_verify():
    num_vars = 4
    batch_size = 4
    num_points = 2
    param = MultilinearKzg.setup(1 << num_vars, np.random.RandomState(23))
    pp, vp = MultilinearKzg.trim(param, 1 << num_vars)

    polys_vals = [rand_fes(1 << num_vars) for _ in range(batch_size)]
    polys = [jnp.asarray(Fr.encode(v)) for v in polys_vals]

    pairs = sorted(
        {(0, 0), (0, 1), (1, 0), (2, 0), (3, 0), (2, 1)}
    )

    tw = new_t()
    comms = MultilinearKzg.batch_commit(pp, polys)
    tw.write_commitments(comms)
    points = [tw.squeeze_challenges(num_vars) for _ in range(num_points)]
    evals = []
    for poly_i, point_i in pairs:
        xd = jnp.asarray(Fr.encode(points[point_i]))
        v = int(Fr.decode(np.asarray(mle.evaluate(Fr, polys[poly_i], xd))[None])[0])
        evals.append(Evaluation(poly_i, point_i, v))
    tw.write_field_elements([e.value for e in evals])
    MultilinearKzg.batch_open(pp, polys, comms, points, evals, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comms_r = tr.read_commitments(batch_size)
    points_r = [tr.squeeze_challenges(num_vars) for _ in range(num_points)]
    vals_r = tr.read_field_elements(len(evals))
    evals_r = [
        Evaluation(e.poly, e.point, v) for e, v in zip(evals, vals_r)
    ]
    MultilinearKzg.batch_verify(vp, comms_r, points_r, evals_r, tr)
