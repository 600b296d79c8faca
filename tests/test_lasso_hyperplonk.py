"""Lasso as HyperPlonk's lookup argument, end to end.

The reference's stated purpose (README.md:3-7) is Lasso *inside* HyperPlonk;
these tests run a circuit with plonkish gates + copy constraints + two Lasso
lookups (two-operand AND table with Surge range memories, plus a range
table whose subtable is larger than the circuit) through
setup/preprocess/prove/verify, and check rejection of invalid witnesses and
tampered proofs.
"""

import os

import numpy as np
import pytest

from halo2_lasso_tpu.backend import MockCircuit
from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
from halo2_lasso_tpu.backend.hyperplonk.fixtures import rand_lasso_circuit
from halo2_lasso_tpu.errors import Halo2LassoError

_BIG = os.environ.get("HALO2_LASSO_TPU_BIG_TESTS", "0") == "1"


def run_lasso_backend(num_vars, **kw):
    circuit_info, circuit = rand_lasso_circuit(
        num_vars,
        np.random.RandomState(num_vars),
        np.random.RandomState(500 + num_vars),
        **kw,
    )
    param = HyperPlonk.setup(circuit_info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, circuit_info)
    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    proof = tw.into_proof()
    tr = new_transcript(proof)
    HyperPlonk.verify(vp, circuit.instances(), tr)
    return proof, pp, vp, circuit


@pytest.mark.parametrize("num_vars", [3, 5, 10] + ([12] if _BIG else []))
def test_lasso_hyperplonk_e2e(num_vars):
    run_lasso_backend(num_vars)


def test_lasso_big_subtable():
    # range subtable (2^10) larger than the circuit hypercube (2^4): the PCS
    # params must cover the final_cts size, not just the circuit size
    run_lasso_backend(4, range_bits=10)


def test_lasso_wrong_output_rejected():
    """A witness where w_and is NOT x & y on one row: the prover completes
    (its Surge columns are internally consistent) but the zero-check binding
    output == g(E...) fails at the verifier."""
    circuit_info, circuit = rand_lasso_circuit(
        3, np.random.RandomState(3), np.random.RandomState(503)
    )
    witnesses = [list(c) for c in circuit._witnesses]
    witnesses[2][3] ^= 1  # flip one bit of w_and[3]
    bad_circuit = MockCircuit([], witnesses)
    param = HyperPlonk.setup(circuit_info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, circuit_info)
    tw = new_transcript()
    HyperPlonk.prove(pp, bad_circuit, tw)
    tr = new_transcript(tw.into_proof())
    with pytest.raises(Halo2LassoError):
        HyperPlonk.verify(vp, bad_circuit.instances(), tr)


def test_lasso_out_of_range_input_raises():
    """An out-of-range lookup operand is refused at witness build time."""
    from halo2_lasso_tpu.lasso.integration import LassoIntegrationError

    circuit_info, circuit = rand_lasso_circuit(
        3, np.random.RandomState(3), np.random.RandomState(503)
    )
    witnesses = [list(c) for c in circuit._witnesses]
    witnesses[4][1] = 1 << 12  # w_r out of the 8-bit range table
    bad_circuit = MockCircuit([], witnesses)
    param = HyperPlonk.setup(circuit_info, np.random.RandomState(0))
    pp, _ = HyperPlonk.preprocess(param, circuit_info)
    with pytest.raises(LassoIntegrationError):
        HyperPlonk.prove(pp, bad_circuit, new_transcript())


def test_lasso_tampered_proof_rejected():
    """Byte flips across the proof stream (commitments, sumcheck messages,
    GKR region, openings) must all be rejected."""
    proof, _, vp, circuit = run_lasso_backend(3)
    for frac in (0.1, 0.4, 0.6, 0.85):
        bad = bytearray(proof)
        bad[int(len(bad) * frac)] ^= 1
        tr = new_transcript(bytes(bad))
        with pytest.raises(Halo2LassoError):
            HyperPlonk.verify(vp, circuit.instances(), tr)
