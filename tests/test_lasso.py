"""Lasso end-to-end: range/AND/LT tables, prove + verify round trips,
negative tests (wrong output, out-of-range index)."""

import os

import numpy as np
import pytest

from halo2_lasso_tpu.errors import Halo2LassoError
from halo2_lasso_tpu.lasso import LassoError, build_witness, prove, verify
from halo2_lasso_tpu.lasso.tables import and_table, lt_table, range_table, xor_table
from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, Fr
from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg
from halo2_lasso_tpu.transcript import Keccak256Transcript

P = Fr.modulus
RNG = np.random.RandomState(77)


def new_t(proof=None):
    return Keccak256Transcript(P, base_modulus=FQ_MODULUS, proof=proof, curve_b=3)


def setup_pcs(num_vars):
    param = MultilinearKzg.setup(1 << num_vars, np.random.RandomState(3))
    return MultilinearKzg.trim(param, 1 << num_vars)


def run_lasso(table, indices):
    nv_m = (len(indices)).bit_length() - 1
    nv = max(nv_m, table.memories[0].subtable.index_bits)
    pp, vp = setup_pcs(nv)
    tw = new_t()
    prove(pp, table, indices, tw)
    proof = tw.into_proof()
    tr = new_t(proof)
    verify(vp, table, nv_m, tr)
    return proof, vp, nv_m


def test_table_lookup_semantics():
    t = and_table(8, 4)
    assert t.lookup((0xAC << 8) | 0xCA) == (0xAC & 0xCA)
    t2 = xor_table(8, 4)
    assert t2.lookup((0x5F << 8) | 0x0F) == (0x5F ^ 0x0F)
    t3 = lt_table(8, 4)
    assert t3.lookup((3 << 8) | 7) == 1
    assert t3.lookup((7 << 8) | 3) == 0
    assert t3.lookup((5 << 8) | 5) == 0
    r = range_table(8, 4)
    assert r.lookup(200) == 200


def test_witness_memory_semantics():
    t = range_table(8, 4)
    idx = [3, 7, 3, 3, 7, 1, 0, 3]
    wit = build_witness(t, idx)
    # read_ts of repeated addresses count up within each memory
    addr0 = wit.dims[0]
    for a in set(addr0.tolist()):
        ts_vals = sorted(wit.read_ts[0][addr0 == a].tolist())
        assert ts_vals == list(range(len(ts_vals)))
        assert wit.final_cts[0][a] == (addr0 == a).sum()


def test_lasso_range_roundtrip():
    table = range_table(8, 4)
    indices = [int(RNG.randint(256)) for _ in range(16)]
    run_lasso(table, indices)


def test_lasso_and_roundtrip():
    table = and_table(4, 2)
    indices = [int(RNG.randint(256)) for _ in range(8)]
    run_lasso(table, indices)


def test_lasso_lt_roundtrip():
    table = lt_table(4, 2)
    indices = [int(RNG.randint(256)) for _ in range(8)]
    run_lasso(table, indices)


def test_lasso_tampered_rejected():
    table = range_table(8, 4)
    indices = [int(RNG.randint(256)) for _ in range(8)]
    proof, vp, nv_m = run_lasso(table, indices)
    bad = bytearray(proof)
    bad[len(bad) // 3] ^= 1
    with pytest.raises(Halo2LassoError):
        verify(vp, table, nv_m, new_t(bytes(bad)))


def test_subtable_closed_form_mle_matches_fold():
    """O(log N) closed-form subtable MLEs == the O(N) fold oracle, at random
    points, for every structured subtable (range/AND/XOR/OR/LT incl. EQ)."""
    from halo2_lasso_tpu.lasso.tables import or_table

    def fold_eval(subtable, x):
        vals = [int(v) for v in subtable.values()]
        for xi in reversed(x):
            half = len(vals) // 2
            vals = [
                (lo + (hi - lo) * xi) % P
                for lo, hi in zip(vals[:half], vals[half:])
            ]
        return vals[0]

    tables = [range_table(8, 4), and_table(4, 2), xor_table(4, 2), or_table(4, 2), lt_table(4, 2)]
    seen = set()
    for table in tables:
        for mem in table.memories:
            sub = mem.subtable
            if sub.name in seen:
                continue
            seen.add(sub.name)
            assert sub.mle_eval is not None, f"{sub.name} missing closed form"
            for trial in range(3):
                x = [int(RNG.randint(1 << 30)) % P for _ in range(sub.index_bits)]
                assert sub.mle_eval(x) == fold_eval(sub, x), sub.name


def test_lasso_over_gemini():
    """Lasso generic over the PCS (north-star parity with the reference's
    Pcs-generic Lasso): same protocol backed by Gemini instead of KZG."""
    from halo2_lasso_tpu.pcs.gemini import Gemini

    table = range_table(16, 8)
    indices = [int(v) for v in RNG.randint(0, 1 << 16, size=8)]
    nv_m = (len(indices)).bit_length() - 1
    nv = max(nv_m, table.memories[0].subtable.index_bits)
    param = Gemini.setup(1 << nv, np.random.RandomState(3))
    pp, vp = Gemini.trim(param, 1 << nv)
    tw = new_t()
    prove(pp, table, indices, tw, pcs=Gemini)
    proof = tw.into_proof()
    tr = new_t(proof)
    verify(vp, table, nv_m, tr, pcs=Gemini)

    bad = bytearray(proof)
    bad[len(bad) // 3] ^= 1
    tr2 = new_t(bytes(bad))
    with pytest.raises(Halo2LassoError):
        verify(vp, table, nv_m, tr2, pcs=Gemini)


@pytest.mark.skipif(
    os.environ.get("HALO2_LASSO_TPU_BIG_TESTS", "0") != "1",
    reason="BIG: 32-bit structured tables (2^16 Surge subtables)",
)
@pytest.mark.parametrize("factory", [and_table, xor_table, lt_table])
def test_lasso_structured_32bit_big(factory):
    """BASELINE config-3 shape at CI scale: 2^12 lookups into the 32-bit
    operand tables (8-bit chunks -> 2^16 subtables, full grand-product
    memory check). The 2^20-lookup numbers are recorded on TPU by
    benchmarks/proof_system.py --circuit lasso_and/xor/lt."""
    table = factory(32, 8)
    rng = np.random.RandomState(11)
    indices = [
        int(v) for v in rng.randint(0, 1 << 62, size=1 << 12, dtype=np.int64)
    ]
    run_lasso(table, indices)
