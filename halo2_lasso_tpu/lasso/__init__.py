"""Lasso lookup argument (Surge decomposition + grand-product memory check).

The reference snapshot predates its Lasso code (SURVEY.md §0); this module
implements the Lasso protocol (eprint 2023/1216) from the paper, built on
this repo's primitives: the EvaluationsProver sumcheck, the GKR
fractional-sumcheck engine run in pure-grand-product mode (p = 0), and the
multilinear-KZG PCS with additive batch openings.

Proof layout (this framework's own format, Keccak256 Fiat-Shamir):
  1. commit a (lookup outputs, log m vars), dim_j (chunks), E_j (reads),
     read_ts_j (all log m vars), final_cts_j (log N_sub vars);
  2. squeeze r (log m challenges); write v = a~(r);
  3. primary sumcheck:  sum_i eq(r, i) * g(E(i)) = v;
  4. squeeze gamma, tau; batched grand products via GKR:
       one batch for the 2*alpha m-sized products  (RS_j, WS_j),
       one batch for the 2*alpha N-sized products  (S_init_j, S_final_j);
     multiset check  prod RS_j * prod S_final_j == prod WS_j * prod S_init_j;
  5. write PCS openings: batch-open the m-sized polys at {primary point,
     GKR m-point}; batch-open the final_cts polys at {GKR N-point}.

Fingerprints: h(addr, val, ts) = ts*gamma^2 + val*gamma + addr - tau.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.expression import Expression, Query
from halo2_lasso_tpu.lasso.tables import LassoTable
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg
from halo2_lasso_tpu.piop import gkr, sum_check
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.utils.timer import timed

P = Fr.modulus


from halo2_lasso_tpu.errors import Halo2LassoError


class LassoError(Halo2LassoError):
    pass


def _decode_scalar(arr) -> int:
    return int(Fr.decode(np.asarray(arr))[None][0])


@dataclasses.dataclass
class LassoWitness:
    """Host-side witness tables (numpy) + device encodings."""

    num_lookup_vars: int  # log m
    dims: List[np.ndarray]  # per chunk: (m,) int64
    e_vals: List[np.ndarray]  # per memory: (m,) object ints
    read_ts: List[np.ndarray]  # per memory: (m,) int64
    final_cts: List[np.ndarray]  # per memory: (N_sub,) int64
    outputs: np.ndarray  # (m,) object ints


def build_witness(table: LassoTable, indices: Sequence[int]) -> LassoWitness:
    """Compute dim/E/read_ts/final_cts/outputs for the lookup indices.

    read_ts via sort + segment ranks (the TPU-friendly replacement for the
    sequential per-address counters of classic offline memory checking).
    """
    m = len(indices)
    assert m & (m - 1) == 0, "pad lookups to a power of two"
    idx_arr = np.asarray(indices, dtype=np.int64)
    dims = table.chunk_indices_np(idx_arr)
    n_sub = 1 << table.memories[0].subtable.index_bits

    e_vals, read_ts, final_cts = [], [], []
    for mem in table.memories:
        addr = dims[mem.chunk]
        tbl = mem.subtable.values()
        e_vals.append(tbl[addr])
        order = np.argsort(addr, kind="stable")
        sorted_addr = addr[order]
        # rank within each address group = read timestamp
        boundaries = np.nonzero(np.diff(sorted_addr))[0] + 1
        starts = np.concatenate([[0], boundaries])
        counts = np.diff(np.concatenate([starts, [m]]))
        group_start = np.repeat(starts, counts)
        ranks = np.arange(m, dtype=np.int64) - group_start
        ts = np.empty(m, dtype=np.int64)
        ts[order] = ranks
        read_ts.append(ts)
        fc = np.zeros(n_sub, dtype=np.int64)
        uniq = sorted_addr[starts]
        fc[uniq] = counts
        final_cts.append(fc)

    # outputs via g over E values — vectorized: evaluate_host's catamorphism
    # is elementwise over numpy object arrays, so ONE pass computes all m
    # outputs (the per-lookup host loop was minutes of pure python at 2^20)
    from halo2_lasso_tpu.expression import evaluate_host

    e_arrs = [np.asarray(e, dtype=object) for e in e_vals]
    outputs = np.asarray(
        evaluate_host(
            table.g, P, lambda kind, q: e_arrs[q.poly] if kind == "poly" else 0, []
        ),
        dtype=object,
    )

    return LassoWitness(
        num_lookup_vars=m.bit_length() - 1,
        dims=dims,
        e_vals=e_vals,
        read_ts=read_ts,
        final_cts=final_cts,
        outputs=outputs,
    )


def _fingerprint(
    addr: jnp.ndarray, val: jnp.ndarray, ts: jnp.ndarray, gamma: int, tau: int
) -> jnp.ndarray:
    """h = ts*gamma^2 + val*gamma + addr - tau over device arrays."""
    g1 = jnp.asarray(Fr.encode([gamma]))[0]
    g2 = jnp.asarray(Fr.encode([gamma * gamma % P]))[0]
    t = jnp.asarray(Fr.encode([tau]))[0]
    acc = F.mont_mul(Fr, ts, g2[None, :])
    acc = F.add(Fr, acc, F.mont_mul(Fr, val, g1[None, :]))
    acc = F.add(Fr, acc, addr)
    return F.sub(Fr, acc, jnp.broadcast_to(t, acc.shape))


@timed("lasso_prove")
def prove(
    pp,
    table: LassoTable,
    indices: Sequence[int],
    transcript,
    pcs=MultilinearKzg,
) -> None:
    """Prove that outputs[i] = T[indices[i]] for all i. Generic over any
    additive PCS whose FIELD is Fr (pcs.rs-style class; default KZG)."""
    from halo2_lasso_tpu.expression import evaluate_jnp
    from halo2_lasso_tpu.lasso.integration import (
        _read_ts_and_final_dev,
        _subtable_dev,
    )

    spec = Fr
    alpha = len(table.memories)
    m = len(indices)
    assert m & (m - 1) == 0, "pad lookups to a power of two"
    nv_m = m.bit_length() - 1
    nv_n = table.memories[0].subtable.index_bits

    # ---- witness + encode (device-native Surge path) ----
    with timed.scope("lasso_encode"):
        # chunking is host int64 (vectorized); everything after — subtable
        # gathers, read-timestamp sort/segment counters, Montgomery encode —
        # stays on device, so 2^20+ lookups never touch host bigints
        dims_host = table.chunk_indices_np(np.asarray(indices, dtype=np.int64))
        dims_u32 = [jnp.asarray(d.astype(np.uint32)) for d in dims_host]
        dim_polys = [F.u32_to_mont(spec, d) for d in dims_u32]
        e_polys, ts_polys, fc_polys = [], [], []
        for mem in table.memories:
            addr = dims_u32[mem.chunk]
            e_polys.append(jnp.take(_subtable_dev(mem.subtable), addr, axis=0))
            ts, fc = _read_ts_and_final_dev(addr, 1 << mem.subtable.index_bits)
            ts_polys.append(F.u32_to_mont(spec, ts))
            fc_polys.append(F.u32_to_mont(spec, fc))
        a_poly = evaluate_jnp(
            spec, table.g, lambda kind, q: e_polys[q.poly], []
        )
    m_sized = [a_poly] + dim_polys + e_polys + ts_polys
    with timed.scope("lasso_commit"):
        m_comms = pcs.batch_commit(pp, m_sized)
        n_comms = pcs.batch_commit(pp, fc_polys)
    pcs.write_commitments(m_comms, transcript)
    pcs.write_commitments(n_comms, transcript)

    # ---- primary sumcheck ----
    r = transcript.squeeze_challenges(nv_m)
    v = _decode_scalar(mle.evaluate(spec, a_poly, jnp.asarray(spec.encode(r))))
    transcript.write_field_element(v)

    expression = Expression.eq_xy(0) * table.g
    with timed.scope("lasso_primary_sumcheck"):
        vp = sum_check.VirtualPolynomial(expression, e_polys, [], [r])
        x_primary, e_evals_primary = sum_check.prove(spec, nv_m, vp, v, transcript)
    transcript.write_field_elements(e_evals_primary)

    # ---- memory checking ----
    gamma = transcript.squeeze_challenge()
    tau = transcript.squeeze_challenge()

    with timed.scope("lasso_fingerprints"):
        subtable_vals: Dict[str, jnp.ndarray] = {}
        for mem in table.memories:
            if mem.subtable.name not in subtable_vals:
                subtable_vals[mem.subtable.name] = _subtable_dev(mem.subtable)
        one = jnp.broadcast_to(jnp.asarray(spec.one), (1 << nv_m, spec.num_limbs))
        addr_n = F.u32_to_mont(spec, jnp.arange(1 << nv_n, dtype=jnp.uint32))
        zeros_n = jnp.zeros((1 << nv_n, spec.num_limbs), dtype=jnp.uint32)
        rs_polys, ws_polys, init_polys, final_polys = [], [], [], []
        for j, mem in enumerate(table.memories):
            addr = dim_polys[mem.chunk]
            val = e_polys[j]
            ts = ts_polys[j]
            rs_polys.append(_fingerprint(addr, val, ts, gamma, tau))
            ws_polys.append(
                _fingerprint(addr, val, F.add(spec, ts, one), gamma, tau)
            )
            tvals = subtable_vals[mem.subtable.name]
            init_polys.append(_fingerprint(addr_n, tvals, zeros_n, gamma, tau))
            final_polys.append(
                _fingerprint(addr_n, tvals, fc_polys[j], gamma, tau)
            )

    # ps=None: pure grand products (GKR skips the zero numerators entirely)
    with timed.scope("lasso_grand_products_m"):
        qs_m = rs_polys + ws_polys
        del rs_polys, ws_polys  # GKR consumes the list (HBM: b x 2^k each)
        _, _, x_m, _ = gkr.prove_fractional_sum_check(
            [0] * (2 * alpha),
            [None] * (2 * alpha),
            [None] * (2 * alpha),
            qs_m,
            transcript,
        )
        del qs_m
    with timed.scope("lasso_grand_products_n"):
        _, _, x_n, _ = gkr.prove_fractional_sum_check(
            [0] * (2 * alpha),
            [None] * (2 * alpha),
            [None] * (2 * alpha),
            init_polys + final_polys,
            transcript,
        )

    # ---- PCS openings ----
    # m-sized polys at points [r, x_primary, x_m]: a at r (value = v, already
    # in the transcript), E_j at x_primary (values = sumcheck final evals,
    # already in the transcript), every m-sized poly at x_m (values written
    # here, used for the GKR leaf fingerprint checks).
    polys = m_sized
    points = [list(r), x_primary, x_m]
    evals: List[Evaluation] = [Evaluation(0, 0, v)]
    for j in range(alpha):
        evals.append(Evaluation(1 + len(dim_polys) + j, 1, e_evals_primary[j]))
    with timed.scope("lasso_open_evals"):
        # one stacked fold chain + one pull for ALL m-sized evals
        xm_vals = mle.evaluate_stacked_ints(spec, polys, x_m)
        for poly_idx, val in enumerate(xm_vals):
            evals.append(Evaluation(poly_idx, 2, val))
        transcript.write_field_elements(xm_vals)
    with timed.scope("lasso_batch_open_m"):
        pcs.batch_open(pp, polys, None, points, evals, transcript)

    # final_cts at x_n
    with timed.scope("lasso_batch_open_n"):
        n_vals = mle.evaluate_stacked_ints(spec, fc_polys, x_n)
        n_evals = [Evaluation(j, 0, v) for j, v in enumerate(n_vals)]
        transcript.write_field_elements(n_vals)
        pcs.batch_open(pp, fc_polys, None, [x_n], n_evals, transcript)


@timed("lasso_verify")
def verify(
    vp,
    table: LassoTable,
    num_lookup_vars: int,
    transcript,
    pcs=MultilinearKzg,
) -> None:
    """Verify a Lasso proof; raises LassoError on rejection."""
    spec = Fr
    alpha = len(table.memories)
    nv_m = num_lookup_vars
    nv_n = table.memories[0].subtable.index_bits
    num_m_polys = 1 + table.num_chunks + 2 * alpha

    m_comms = pcs.read_commitments(vp, num_m_polys, transcript)
    n_comms = pcs.read_commitments(vp, alpha, transcript)

    r = transcript.squeeze_challenges(nv_m)
    v = transcript.read_field_element()

    expression = Expression.eq_xy(0) * table.g
    x_eval, x_primary = sum_check.verify(
        P, nv_m, expression.degree, v, transcript
    )
    e_evals_primary = transcript.read_field_elements(alpha)
    eval_map = {Query(j, 0): ev for j, ev in enumerate(e_evals_primary)}
    got = sum_check.evaluate_at_point(
        expression, P, nv_m, eval_map, [], [r], x_primary
    )
    if got != x_eval:
        raise LassoError("primary sumcheck final check failed")

    gamma = transcript.squeeze_challenge()
    tau = transcript.squeeze_challenge()

    _, q_m, x_m, (_, q0_m) = gkr.verify_fractional_sum_check(
        nv_m, [0] * (2 * alpha), [None] * (2 * alpha), transcript
    )
    _, q_n, x_n, (_, q0_n) = gkr.verify_fractional_sum_check(
        nv_n, [0] * (2 * alpha), [None] * (2 * alpha), transcript
    )
    # multiset equality per memory on the PRODUCT claims (GKR top layer)
    rs_prods, ws_prods = q0_m[:alpha], q0_m[alpha:]
    init_prods, final_prods = q0_n[:alpha], q0_n[alpha:]
    for j in range(alpha):
        if rs_prods[j] * final_prods[j] % P != ws_prods[j] * init_prods[j] % P:
            raise LassoError(f"memory check product mismatch (memory {j})")

    # ---- m-sized openings at [r, x_primary, x_m] ----
    xm_vals = transcript.read_field_elements(num_m_polys)
    evals: List[Evaluation] = [Evaluation(0, 0, v)]
    for j in range(alpha):
        evals.append(Evaluation(1 + table.num_chunks + j, 1, e_evals_primary[j]))
    for poly_idx in range(num_m_polys):
        evals.append(Evaluation(poly_idx, 2, xm_vals[poly_idx]))

    # GKR leaf checks at x_m: RS_j/WS_j from dim/E/ts openings
    dim_evals = xm_vals[1 : 1 + table.num_chunks]
    e_evals = xm_vals[1 + table.num_chunks : 1 + table.num_chunks + alpha]
    ts_evals = xm_vals[1 + table.num_chunks + alpha :]
    g2 = gamma * gamma % P
    for j, mem in enumerate(table.memories):
        h_rs = (ts_evals[j] * g2 + e_evals[j] * gamma + dim_evals[mem.chunk] - tau) % P
        h_ws = ((ts_evals[j] + 1) * g2 + e_evals[j] * gamma + dim_evals[mem.chunk] - tau) % P
        if h_rs != q_m[j] or h_ws != q_m[alpha + j]:
            raise LassoError(f"fingerprint opening mismatch (memory {j})")

    pcs.batch_verify(
        vp, m_comms, [list(r), x_primary, x_m], evals, transcript
    )

    # ---- N-sized openings at x_n ----
    n_vals = transcript.read_field_elements(alpha)
    n_evals = [Evaluation(j, 0, n_vals[j]) for j in range(alpha)]
    # init/final fingerprints at x_n against table MLEs (subtables are
    # public/structured, evaluated directly by the verifier)
    addr_eval = mle.identity_eval_host(P, x_n)
    for j, mem in enumerate(table.memories):
        t_eval = _subtable_mle_eval(mem.subtable, x_n)
        h_init = (t_eval * gamma + addr_eval - tau) % P
        h_final = (n_vals[j] * g2 + t_eval * gamma + addr_eval - tau) % P
        if h_init != q_n[j] or h_final != q_n[alpha + j]:
            raise LassoError(f"init/final fingerprint mismatch (memory {j})")

    pcs.batch_verify(vp, n_comms, [x_n], n_evals, transcript)


def _subtable_mle_eval(subtable, x: Sequence[int]) -> int:
    """Evaluate the subtable's MLE at x on host.

    Structured subtables carry an O(log N_sub) closed form (`mle_eval`,
    lasso/tables.py) — verifier cost independent of the subtable size, which
    is the point of Lasso/Surge. The O(N) fold remains as the fallback for
    ad-hoc tables (and as the test oracle for the closed forms)."""
    if subtable.mle_eval is not None:
        return subtable.mle_eval([xi % P for xi in x])
    vals = [int(v) for v in subtable.values()]
    for xi in reversed(x):
        half = len(vals) // 2
        vals = [
            (lo + (hi - lo) * xi) % P for lo, hi in zip(vals[:half], vals[half:])
        ]
    return vals[0]
