"""GKR fractional sumcheck round trip (mirror of
fractional_sum_check.rs:327-370): prove, verify from proof bytes, and check
the final claims against direct MLE evaluations."""

import numpy as np
import jax.numpy as jnp

from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.piop import gkr
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript

P = Fr.modulus
RNG = np.random.RandomState(31)


def rand_fes(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def test_fractional_sum_check():
    num_batching = 2
    for num_vars in [1, 3, 4]:
        polys_vals = [rand_fes(1 << num_vars) for _ in range(2 * num_batching)]
        polys = [jnp.asarray(Fr.encode(v)) for v in polys_vals]
        ps, qs = polys[:num_batching], polys[num_batching:]
        claims = [None] * num_batching

        tw = Keccak256Transcript(P)
        gkr.prove_fractional_sum_check(claims, claims, ps, qs, tw)
        proof = tw.into_proof()

        tr = Keccak256Transcript(P, proof=proof)
        p_xs, q_xs, x, _ = gkr.verify_fractional_sum_check(num_vars, claims, claims, tr)

        xd = jnp.asarray(Fr.encode(x))
        for vals, eval_ in zip(polys_vals, p_xs + q_xs):
            got = int(Fr.decode(np.asarray(mle.evaluate(Fr, jnp.asarray(Fr.encode(vals)), xd))[None])[0])
            assert got == eval_, num_vars


def test_fractional_sum_matches_rational_sum():
    """claimed p0/q0 encode sum p_i(b)/q_i(b) as a single fraction per layer
    semantics: verify the top claim equals the true fractional sum."""
    num_vars = 3
    p_vals = rand_fes(1 << num_vars)
    q_vals = rand_fes(1 << num_vars)
    ps = [jnp.asarray(Fr.encode(p_vals))]
    qs = [jnp.asarray(Fr.encode(q_vals))]

    tw = Keccak256Transcript(P)
    gkr.prove_fractional_sum_check([None], [None], ps, qs, tw)
    proof = tw.into_proof()
    tr = Keccak256Transcript(P, proof=proof)
    # read the written (p0, q0)
    p0 = tr.read_field_element()
    q0 = tr.read_field_element()
    expect = sum(pv * pow(qv, -1, P) for pv, qv in zip(p_vals, q_vals)) % P
    assert p0 * pow(q0, -1, P) % P == expect
