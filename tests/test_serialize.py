"""Param serialization round trips (reference: all Param/ProverParam/
VerifierParam are serde+bincode, backend.rs:18-19 / pcs.rs:23-25; here
npz + JSON side-car, utils/serialize.py)."""

import numpy as np

from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
from halo2_lasso_tpu.backend.hyperplonk.fixtures import rand_vanilla_plonk_circuit
from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg
from halo2_lasso_tpu.utils.serialize import (
    load_hyperplonk_params,
    load_kzg_params,
    save_hyperplonk_params,
    save_kzg_params,
)


def test_kzg_params_roundtrip(tmp_path):
    params = MultilinearKzg.setup(1 << 3, np.random.RandomState(7))
    base = str(tmp_path / "kzg")
    save_kzg_params(base, params)
    loaded = load_kzg_params(base)
    assert loaded.g1 == params.g1
    assert loaded.g2 == params.g2
    assert loaded.ss == params.ss
    for a, b in zip(loaded.eqs, params.eqs):
        for c in ("x", "y", "z"):
            assert np.array_equal(np.asarray(a[c]), np.asarray(b[c]))


def test_hyperplonk_params_roundtrip_prove_verify(tmp_path):
    """A proof made with stored+reloaded pp verifies under reloaded vp and is
    byte-identical to one made with the originals."""
    nv = 2
    circuit_info, circuit = rand_vanilla_plonk_circuit(
        nv, np.random.RandomState(nv), np.random.RandomState(100 + nv)
    )
    param = HyperPlonk.setup(circuit_info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, circuit_info)

    base = str(tmp_path / "hp")
    save_hyperplonk_params(base, pp, vp)
    pp2, vp2 = load_hyperplonk_params(base)

    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    proof = tw.into_proof()

    tw2 = new_transcript()
    HyperPlonk.prove(pp2, circuit, tw2)
    assert tw2.into_proof() == proof

    tr = new_transcript(proof)
    HyperPlonk.verify(vp2, circuit.instances(), tr)

def test_lasso_setup_roundtrip_prove_verify(tmp_path):
    """A Lasso setup (structured-table spec + KZG params) stored and reloaded
    produces byte-identical proofs that verify."""
    from halo2_lasso_tpu import lasso
    from halo2_lasso_tpu.lasso.tables import range_table
    from halo2_lasso_tpu.utils.serialize import load_lasso_setup, save_lasso_setup

    table = range_table(4, 4)
    rng = np.random.RandomState(11)
    m = 8
    nv_m = m.bit_length() - 1
    nv = max(nv_m, table.memories[0].subtable.index_bits)
    params = MultilinearKzg.setup(1 << nv, rng)
    pp, vp = MultilinearKzg.trim(params, 1 << nv)

    base = str(tmp_path / "lasso")
    save_lasso_setup(base, table, params)
    table2, params2 = load_lasso_setup(base)
    pp2, vp2 = MultilinearKzg.trim(params2, 1 << nv)
    assert table2.name == table.name and table2.num_chunks == table.num_chunks

    indices = [int(v) for v in rng.randint(0, 1 << 4, size=m)]
    tw = new_transcript()
    lasso.prove(pp, table, indices, tw)
    proof = tw.into_proof()

    tw2 = new_transcript()
    lasso.prove(pp2, table2, indices, tw2)
    assert tw2.into_proof() == proof

    tr = new_transcript(proof)
    lasso.verify(vp2, table2, nv_m, tr)
