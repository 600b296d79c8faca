"""Secondary multilinear PCS round trips: IPA, Hyrax, Gemini, Zeromorph
(mirror of the reference's shared PCS harness at reduced sizes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_lasso_tpu.errors import Halo2LassoError

from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript

P = Fr.modulus
RNG = np.random.RandomState(21)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def new_t(proof=None):
    return Keccak256Transcript(P, base_modulus=FQ_MODULUS, proof=proof, curve_b=3)


def eval_mle(vals, point):
    arr = jnp.asarray(Fr.encode(vals))
    xd = jnp.asarray(Fr.encode(point))
    from halo2_lasso_tpu.ops import field as F

    return F.decode_scalar(Fr, np.asarray(mle.evaluate(Fr, arr, xd)))


def run_single(pcs_cls, setup_fn, num_vars):
    param = setup_fn(1 << num_vars)
    pp, vp = pcs_cls.trim(param, 1 << num_vars)
    vals = rand_fes(1 << num_vars)
    poly = jnp.asarray(Fr.encode(vals))

    tw = new_t()
    comm = pcs_cls.commit(pp, poly)
    if isinstance(comm, list):
        tw.write_commitments(comm)
    else:
        tw.write_commitment(comm)
    point = tw.squeeze_challenges(num_vars)
    v = eval_mle(vals, point)
    tw.write_field_element(v)
    pcs_cls.open(pp, poly, point, v, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comm_r = tr.read_commitments(len(comm)) if isinstance(comm, list) else tr.read_commitment()
    point_r = tr.squeeze_challenges(num_vars)
    v_r = tr.read_field_element()
    pcs_cls.verify(vp, comm_r, point_r, v_r, tr)

    # tampered eval rejected
    tr2 = new_t(proof)
    c2 = tr2.read_commitments(len(comm)) if isinstance(comm, list) else tr2.read_commitment()
    pt2 = tr2.squeeze_challenges(num_vars)
    tr2.read_field_element()
    with pytest.raises(Halo2LassoError):
        pcs_cls.verify(vp, c2, pt2, (v_r + 1) % P, tr2)


def run_batch(pcs_cls, setup_fn, num_vars, batch_size=3, num_points=2):
    param = setup_fn(1 << num_vars)
    pp, vp = pcs_cls.trim(param, 1 << num_vars)
    vals = [rand_fes(1 << num_vars) for _ in range(batch_size)]
    polys = [jnp.asarray(Fr.encode(v)) for v in vals]

    tw = new_t()
    comms = pcs_cls.batch_commit(pp, polys)
    for c in comms:
        if isinstance(c, list):
            tw.write_commitments(c)
        else:
            tw.write_commitment(c)
    points = [tw.squeeze_challenges(num_vars) for _ in range(num_points)]
    pairs = [(0, 0), (1, 0), (2, 1), (0, 1)]
    evals = [Evaluation(pi, ti, eval_mle(vals[pi], points[ti])) for pi, ti in pairs]
    tw.write_field_elements([e.value for e in evals])
    pcs_cls.batch_open(pp, polys, comms, points, evals, tw)
    proof = tw.into_proof()

    tr = new_t(proof)
    comms_r = []
    for c in comms:
        comms_r.append(tr.read_commitments(len(c)) if isinstance(c, list) else tr.read_commitment())
    points_r = [tr.squeeze_challenges(num_vars) for _ in range(num_points)]
    ev_vals = tr.read_field_elements(len(evals))
    evals_r = [Evaluation(e.poly, e.point, v) for e, v in zip(evals, ev_vals)]
    pcs_cls.batch_verify(vp, comms_r, points_r, evals_r, tr)


def test_ipa():
    from halo2_lasso_tpu.pcs.ipa import MultilinearIpa

    run_single(MultilinearIpa, MultilinearIpa.setup, 4)


def test_hyrax():
    from halo2_lasso_tpu.pcs.hyrax import MultilinearHyrax

    run_single(MultilinearHyrax, MultilinearHyrax.setup, 4)


def test_gemini():
    import numpy as _np
    from halo2_lasso_tpu.pcs.gemini import Gemini

    run_single(Gemini, lambda n: Gemini.setup(n, _np.random.RandomState(2)), 4)


def test_zeromorph():
    import numpy as _np
    from halo2_lasso_tpu.pcs.zeromorph import Zeromorph

    run_single(Zeromorph, lambda n: Zeromorph.setup(n, _np.random.RandomState(2)), 4)


def test_gemini_batch():
    import numpy as _np
    from halo2_lasso_tpu.pcs.gemini import Gemini

    run_batch(Gemini, lambda n: Gemini.setup(n, _np.random.RandomState(4)), 3)


def test_zeromorph_batch():
    import numpy as _np
    from halo2_lasso_tpu.pcs.zeromorph import Zeromorph

    run_batch(Zeromorph, lambda n: Zeromorph.setup(n, _np.random.RandomState(4)), 3)


def test_ipa_batch():
    from halo2_lasso_tpu.pcs.ipa import MultilinearIpa

    run_batch(MultilinearIpa, MultilinearIpa.setup, 3)
