"""Frozen proof-bytes snapshot: refactors must not silently change the wire
format.

The reference's acceptance criterion is bit-exactness of the transcript
stream (/root/reference/plonkish_backend/src/util/transcript.rs:126-166
keccak absorb/squeeze layout); no Rust toolchain exists in this image, so
the anchor is a snapshot of THIS implementation's bytes for a fixed seed —
any change to field encoding, point serialization, challenge squeezing or
protocol message order shows up as a hash mismatch. The keccak KATs
(tests/test_keccak_kat.py) anchor the hash itself to published vectors.
"""

import hashlib

import numpy as np

from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
from halo2_lasso_tpu.backend.hyperplonk.fixtures import rand_vanilla_plonk_circuit

GOLDEN_LEN = 1760
GOLDEN_SHA256 = "c7716e87345611deed36d015513aecec8da288a8433e74610cf420cf687be3c0"
GOLDEN_HEAD = "234ce5fa052b5a0abb7f77f498818925810fb53717e987f9f57ea57a932fed10"


def test_golden_proof_bytes():
    ci, circ = rand_vanilla_plonk_circuit(
        3, np.random.RandomState(42), np.random.RandomState(43)
    )
    param = HyperPlonk.setup(ci, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, ci)
    tw = new_transcript()
    HyperPlonk.prove(pp, circ, tw)
    proof = tw.into_proof()
    tr = new_transcript(proof)
    HyperPlonk.verify(vp, circ.instances(), tr)
    assert len(proof) == GOLDEN_LEN
    assert proof[:32].hex() == GOLDEN_HEAD
    assert hashlib.sha256(proof).hexdigest() == GOLDEN_SHA256
