"""Multi-phase witness path e2e: a phase-0 challenge used in a gate.

Exercises the reference's phase/challenge machinery (backend/hyperplonk.rs:
186-204 prover round loop, frontend/halo2.rs:222-244 per-phase synthesis):
num_challenges = [1, 0], the phase-1 witness is synthesized against the
squeezed challenge, and a witness built against a WRONG challenge value is
rejected by the verifier's zero check.
"""

import numpy as np
import pytest

from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
from halo2_lasso_tpu.backend.hyperplonk.fixtures import rand_two_phase_circuit
from halo2_lasso_tpu.errors import Halo2LassoError


def _run(num_vars, cheat):
    circuit_info, circuit = rand_two_phase_circuit(
        num_vars, np.random.RandomState(100 + num_vars), cheat=cheat
    )
    param = HyperPlonk.setup(circuit_info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, circuit_info)
    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    proof = tw.into_proof()
    tr = new_transcript(proof)
    HyperPlonk.verify(vp, circuit.instances(), tr)
    return proof


@pytest.mark.parametrize("num_vars", [3, 5])
def test_two_phase_challenge_e2e(num_vars):
    _run(num_vars, cheat=False)


def test_wrong_phase_witness_rejected():
    with pytest.raises(Halo2LassoError):
        _run(3, cheat=True)
