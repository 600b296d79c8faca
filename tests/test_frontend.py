"""Frontend circuit-builder test: build a small fibonacci-ish circuit with
gates + copy constraints + an instance column, prove and verify e2e."""

import os

import numpy as np
import pytest

from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
from halo2_lasso_tpu.frontend.builder import CircuitBuilder
from halo2_lasso_tpu.ops.bn254 import Fr

P = Fr.modulus


def test_builder_e2e():
    k = 3
    n_rows = (1 << k) - 1  # last row unused (bh row layout)
    b = CircuitBuilder(k)
    pi = b.instance_column()
    q = b.selector()
    a = b.advice_column()
    bcol = b.advice_column()
    c = b.advice_column()
    b.max_degree = 4

    # gate: q * (a + b - c) == 0
    b.gate("add", lambda ctx: ctx.expr(q) * (ctx.expr(a) + ctx.expr(bcol) - ctx.expr(c)))

    # rows 0..4: c = a + b; chain c_i -> a_{i+1} via copies
    rows = 5
    a_vals = [3] + [0] * (rows - 1)
    b_vals = [4, 5, 6, 7, 8]
    c_vals = []
    for i in range(rows):
        c_vals.append((a_vals[i] + b_vals[i]) % P)
        if i + 1 < rows:
            a_vals.append(c_vals[i]) if len(a_vals) <= i + 1 else None
            a_vals[i + 1] = c_vals[i]
            b.copy(c, i, a, i + 1)

    fixed = {(q.index, r): 1 for r in range(rows)}

    def advice_fn(phase, challenges):
        assert phase == 0
        pad = (1 << k) - rows
        return [
            a_vals + [0] * pad,
            b_vals + [0] * pad,
            c_vals + [0] * pad,
        ]

    instances = [[]]  # instance column present but no public values
    info, circuit = b.build(fixed, advice_fn, instances)
    assert info.is_well_formed()

    param = HyperPlonk.setup(info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, info)
    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    proof = tw.into_proof()
    tr = new_transcript(proof)
    HyperPlonk.verify(vp, instances, tr)


def test_builder_lasso_lookup():
    """Declare a Lasso AND-table lookup straight from the frontend builder
    (frontend reaches every backend feature, frontend/halo2.rs:100-216)."""
    from halo2_lasso_tpu.expression import Expression
    from halo2_lasso_tpu.lasso.tables import and_table

    k = 3
    b = CircuitBuilder(k)
    x = b.advice_column()
    y = b.advice_column()
    z = b.advice_column()
    b.max_degree = 4
    table = and_table(4, 2)
    b.lasso_lookup(
        "and", table, lambda ctx: ((ctx.expr(x), ctx.expr(y)), ctx.expr(z))
    )

    xv = [5, 9, 15, 0, 3, 7, 1, 2]
    yv = [3, 12, 15, 0, 1, 7, 0, 2]
    zv = [a & c for a, c in zip(xv, yv)]

    info, circuit = b.build({}, lambda phase, ch: [xv, yv, zv], [])
    assert info.is_well_formed()
    assert len(info.lasso_lookups) == 1

    param = HyperPlonk.setup(info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, info)
    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    tr = new_transcript(tw.into_proof())
    HyperPlonk.verify(vp, circuit.instances(), tr)


def test_builder_two_phase_challenge():
    """Multi-phase witness + challenge through the builder: phase-1 advice
    synthesized against the phase-0 squeezed challenge
    (frontend/halo2.rs:222-244 semantics)."""
    from halo2_lasso_tpu.expression import Expression

    k = 3
    b = CircuitBuilder(k, num_phases=2)
    w0 = b.advice_column(0)
    w1 = b.advice_column(1)
    th = b.challenge(0)
    b.max_degree = 4
    b.gate(
        "phase1",
        lambda ctx: Expression.challenge(th) * ctx.expr(w0)
        + ctx.expr(w0) * ctx.expr(w0)
        - ctx.expr(w1),
    )

    rng = np.random.RandomState(42)
    w0_vals = [int(v) for v in rng.randint(0, 1 << 16, 1 << k)]

    def advice_fn(phase, challenges):
        if phase == 0:
            return [w0_vals]
        theta = challenges[0]
        return [[(theta * v + v * v) % P for v in w0_vals]]

    info, circuit = b.build({}, advice_fn, [])
    assert info.is_well_formed()
    assert info.num_challenges == [1, 0]

    param = HyperPlonk.setup(info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, info)
    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    tr = new_transcript(tw.into_proof())
    HyperPlonk.verify(vp, circuit.instances(), tr)


def test_arx_chain_e2e():
    """The structured big-circuit fixture (frontend/arx.py) at reduced size:
    8-bit words, 4-bit xor chunks, rot 3 — gates + three Lasso tables."""
    from halo2_lasso_tpu.frontend.arx import arx_chain_circuit

    info, circuit = arx_chain_circuit(4, word_bits=8, chunk_bits=4, rot=3)
    assert info.is_well_formed()
    param = HyperPlonk.setup(info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, info)
    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    tr = new_transcript(tw.into_proof())
    HyperPlonk.verify(vp, circuit.instances(), tr)


_BIG = os.environ.get("HALO2_LASSO_TPU_BIG_TESTS", "0") == "1"


@pytest.mark.skipif(not _BIG, reason="HALO2_LASSO_TPU_BIG_TESTS=1 for the 32-bit ARX chain")
def test_arx_chain_32bit_k14():
    """Structured circuit at non-toy scale (VERDICT r4 Next #5): full 32-bit
    ARX words, 8-bit xor chunks (2^16 Surge subtables), 2^14 rows through
    the complete backend — the stepping stone to BASELINE config 4's 2^22.
    Reference counterpart: benchmark sha256 k>=17 runs
    (/root/reference/benchmark/benches/proof_system.rs:150-251)."""
    from halo2_lasso_tpu.frontend.arx import arx_chain_circuit

    info, circuit = arx_chain_circuit(14)
    assert info.is_well_formed()
    param = HyperPlonk.setup(info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, info)
    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    tr = new_transcript(tw.into_proof())
    HyperPlonk.verify(vp, circuit.instances(), tr)
