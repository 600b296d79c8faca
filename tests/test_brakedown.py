"""Brakedown PCS: code parameter sanity (vs paper-derived constants),
encode linearity, and commit/open/verify round trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.pcs.brakedown import (
    SPEC1,
    SPEC6,
    BrakedownCode,
    MultilinearBrakedown,
)
from halo2_lasso_tpu.pcs.multilinear_kzg import PcsError
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript

P = Fr.modulus
RNG = np.random.RandomState(66)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def test_spec_constants():
    """Mirror of brakedown.rs:370-390: spec-derived code dimensions are
    monotone and distances sane."""
    for spec in (SPEC1, SPEC6):
        a, b = spec.dimensions(254, 1 << 10, 20)
        assert a[0][0] == 1 << 10
        for (n, m, d) in a:
            assert 0 < d <= m and m < n
        cw = spec.codeword_len(254, 1 << 10, 20)
        assert cw > (1 << 10)
        assert spec.num_column_opening() > 0
        assert spec.num_proximity_testing(254, 1 << 10, 20) >= 1


def test_encode_linear():
    code = BrakedownCode(6, 10, SPEC6, np.random.RandomState(1))
    u = rand_fes(code.row_len)
    v = rand_fes(code.row_len)
    c = rand_fes(1)[0]
    eu = Fr.decode(np.asarray(code.encode(jnp.asarray(Fr.encode(u)))))
    ev = Fr.decode(np.asarray(code.encode(jnp.asarray(Fr.encode(v)))))
    w = [(a + c * b) % P for a, b in zip(u, v)]
    ew = Fr.decode(np.asarray(code.encode(jnp.asarray(Fr.encode(w)))))
    for i in range(code.codeword_len):
        assert int(ew[i]) == (int(eu[i]) + c * int(ev[i])) % P


@pytest.mark.parametrize("num_vars", [6])
def test_commit_open_verify(num_vars):
    pp = MultilinearBrakedown.setup(1 << num_vars, np.random.RandomState(2))
    pp, vp = MultilinearBrakedown.trim(pp, 1 << num_vars)
    vals = rand_fes(1 << num_vars)
    poly = jnp.asarray(Fr.encode(vals))

    tw = Keccak256Transcript(P)
    comm = MultilinearBrakedown.commit(pp, poly)
    tw.write_hash(comm.root)
    point = tw.squeeze_challenges(num_vars)
    from halo2_lasso_tpu.ops import field as F

    v = F.decode_scalar(Fr, np.asarray(mle.evaluate(Fr, poly, jnp.asarray(Fr.encode(point)))))
    tw.write_field_element(v)
    MultilinearBrakedown.open(pp, poly, comm, point, v, tw)
    proof = tw.into_proof()

    tr = Keccak256Transcript(P, proof=proof)
    root = tr.read_hash()
    point_r = tr.squeeze_challenges(num_vars)
    v_r = tr.read_field_element()
    MultilinearBrakedown.verify(vp, root, point_r, v_r, tr)

    tr2 = Keccak256Transcript(P, proof=proof)
    tr2.read_hash()
    tr2.squeeze_challenges(num_vars)
    tr2.read_field_element()
    with pytest.raises(PcsError):
        MultilinearBrakedown.verify(vp, root, point_r, (v_r + 1) % P, tr2)
