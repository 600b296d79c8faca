"""Frontend circuit-builder test: build a small fibonacci-ish circuit with
gates + copy constraints + an instance column, prove and verify e2e."""

import numpy as np

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
