"""HyperPlonk generic over the PCS: the reference's test matrix
(hyperplonk.rs:398-427 instantiates HyperPlonk<Pcs> for six PCS x
{vanilla plonk, vanilla plonk with lookup}), at CI-friendly sizes."""

import numpy as np
import pytest

from halo2_lasso_tpu.backend.hyperplonk import hyperplonk
from halo2_lasso_tpu.errors import Halo2LassoError
from halo2_lasso_tpu.backend.hyperplonk.fixtures import (
    rand_vanilla_plonk_circuit,
    rand_vanilla_plonk_with_lookup_circuit,
)
from halo2_lasso_tpu.pcs.brakedown import MultilinearBrakedown
from halo2_lasso_tpu.pcs.gemini import Gemini
from halo2_lasso_tpu.pcs.hyrax import MultilinearHyrax, MultilinearHyraxGrumpkin
from halo2_lasso_tpu.pcs.ipa import MultilinearIpa, MultilinearIpaGrumpkin
from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg
from halo2_lasso_tpu.pcs.zeromorph import Zeromorph

PCS_CLASSES = [
    MultilinearKzg,
    Gemini,
    Zeromorph,
    MultilinearIpa,
    MultilinearHyrax,
    MultilinearBrakedown,
    # the grumpkin half of the 2-cycle: the SNARK runs over bn254 Fq
    # (hyperplonk.rs:422-423)
    MultilinearIpaGrumpkin,
    MultilinearHyraxGrumpkin,
]


def run_backend(backend, num_vars, circuit_fn):
    circuit_info, circuit = circuit_fn(
        num_vars,
        np.random.RandomState(num_vars),
        np.random.RandomState(100 + num_vars),
        field=backend.field(),
    )
    param = backend.setup(circuit_info, np.random.RandomState(0))
    pp, vp = backend.preprocess(param, circuit_info)

    tw = backend.transcript()
    backend.prove(pp, circuit, tw)
    proof = tw.into_proof()

    tr = backend.transcript(proof)
    backend.verify(vp, circuit.instances(), tr)
    return proof, vp, circuit


@pytest.mark.parametrize("pcs", PCS_CLASSES, ids=lambda c: c.__name__)
def test_vanilla_plonk(pcs):
    # reference exercises each PCS to nv=16 (hyperplonk.rs:398-427);
    # nv=8 default here, nv=12 for the KZG-family below
    run_backend(hyperplonk(pcs), 8, rand_vanilla_plonk_circuit)


@pytest.mark.parametrize("pcs", PCS_CLASSES, ids=lambda c: c.__name__)
def test_vanilla_plonk_with_lookup(pcs):
    run_backend(hyperplonk(pcs), 8, rand_vanilla_plonk_with_lookup_circuit)


@pytest.mark.parametrize("pcs", [Gemini, MultilinearIpa], ids=lambda c: c.__name__)
def test_tampered_proof_rejected(pcs):
    backend = hyperplonk(pcs)
    proof, vp, circuit = run_backend(backend, 3, rand_vanilla_plonk_circuit)
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    tr = backend.transcript(bytes(bad))
    with pytest.raises(Halo2LassoError):
        backend.verify(vp, circuit.instances(), tr)


@pytest.mark.parametrize("pcs", [Gemini, Zeromorph], ids=lambda c: c.__name__)
def test_vanilla_plonk_nv12(pcs):
    # non-toy size in the default suite (reference sweeps to 16,
    # hyperplonk.rs:398-427); KZG at nv=10+ is covered by test_hyperplonk.py
    run_backend(hyperplonk(pcs), 12, rand_vanilla_plonk_circuit)
