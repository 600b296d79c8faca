"""HyperPlonk prover helpers, TPU-native.

Semantics mirror /root/reference/plonkish_backend/src/backend/hyperplonk/
prover.rs; implementations are redesigned for XLA:
  * lookup compressed polys: the lookup input/table expressions are traced
    into one fused device pass over all 2^k points (prover.rs:50-137's
    per-row interpreter loop becomes a jnp program);
  * lookup h polys: batched inversion via the scan-based batch_inv
    (prover.rs:194-250's BatchInvert chunks);
  * permutation z polys: the reference's *sequential* running product in bh
    order (prover.rs:307-323) becomes a log-depth `associative_scan` prefix
    product over the (bh-ordered, chunk-interleaved) factor sequence,
    followed by index gathers — the classic parallel-prefix rewrite;
  * lookup m polys: multiplicity counting (hashmap in prover.rs:139-192)
    done by sorting table+input values host-side (generic fallback; Lasso's
    structured tables use index arithmetic instead and never touch this).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.expression import Expression, Query, evaluate_jnp
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.piop import sum_check
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.poly.bh import BooleanHypercube


from halo2_lasso_tpu.errors import Halo2LassoError


class ProofError(Halo2LassoError):
    pass


def row_mapping(k: int) -> np.ndarray:
    """Witness row r -> hypercube index (hyperplonk.rs:365-369)."""
    seq = BooleanHypercube(k).iter_indices()
    return np.concatenate([seq[1:], seq[:1]])


def instance_poly_values(
    num_vars: int, instances: Sequence[int], spec=None
) -> List[int]:
    """prover.rs:32-48: place instance values at their bh rows."""
    rm = row_mapping(num_vars)
    out = [0] * (1 << num_vars)
    p = (spec or Fr).modulus
    for r, v in enumerate(instances):
        out[int(rm[r])] = v % p
    return out


def _expr_leaf_fn(spec, num_vars: int, polys: Sequence[jnp.ndarray], expression: Expression):
    """Build a leaf function for device expression evaluation over full tables
    (rotations via bh gathers, identity as arange, lagrange as one-hot)."""
    bh = BooleanHypercube(num_vars)
    cache: Dict = {}

    def leaf(kind, arg):
        if kind == "poly":
            key = ("poly", arg.poly, arg.rotation)
            if key not in cache:
                arr = polys[arg.poly]
                if arg.rotation != 0:
                    arr = mle.rotate_evals(spec, arr, arg.rotation)
                cache[key] = arr
            return cache[key]
        if kind == "identity":
            if ("identity",) not in cache:
                idx = np.arange(1 << num_vars, dtype=object)
                cache[("identity",)] = jnp.asarray(spec.encode(idx))
            return cache[("identity",)]
        if kind == "lagrange":
            key = ("lagrange", arg)
            if key not in cache:
                b = int(bh.iter_indices()[arg % (1 << num_vars)])
                onehot = np.zeros(1 << num_vars, dtype=object)
                onehot[b] = 1
                cache[key] = jnp.asarray(spec.encode(onehot))
            return cache[key]
        raise ValueError(kind)

    return leaf


def lookup_compressed_polys(
    lookups: Sequence[Sequence[Tuple[Expression, Expression]]],
    polys: Sequence[jnp.ndarray],
    challenges: Sequence[int],
    betas: Sequence[int],
    spec=None,
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """prover.rs:50-137: per lookup, (compressed input, compressed table) =
    sum_i betas[i] * expr_i evaluated over all b. One fused device pass."""
    if not lookups:
        return []
    spec = spec or Fr
    num_vars = polys[0].shape[0].bit_length() - 1
    chal_dev = [jnp.asarray(spec.encode([c]))[0] for c in challenges]
    betas_dev = [jnp.asarray(spec.encode([b]))[0] for b in betas]

    out = []
    for lookup in lookups:
        pair = []
        for exprs in ([inp for inp, _ in lookup], [tbl for _, tbl in lookup]):
            acc = None
            for beta_d, e in zip(betas_dev, exprs):
                leaf = _expr_leaf_fn(spec, num_vars, polys, e)
                v = evaluate_jnp(spec, e, leaf, chal_dev)
                if v.ndim == 1:  # constant expression broadcast
                    v = jnp.broadcast_to(v, (1 << num_vars,) + v.shape)
                term = F.mont_mul(spec, v, beta_d[None, :])
                acc = term if acc is None else F.add(spec, acc, term)
            pair.append(acc)
        out.append((pair[0], pair[1]))
    return out


@jax.jit
def _m_poly_counts(inp: jnp.ndarray, tbl: jnp.ndarray):
    """Device multiplicity count: m[idx] = #occurrences of table[idx] among
    inputs, attributed to the LAST index of each distinct table value
    (prover.rs:150-180 hashmap semantics, as sort + segment reduction).

    Returns (m int32 counts (n,), invalid flag): invalid is set iff some
    input value does not occur in the table."""
    L = inp.shape[1]
    n = tbl.shape[0]
    arr = jnp.concatenate([tbl, inp])  # (2n, L) montgomery limbs
    is_input = jnp.concatenate(
        [jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.int32)]
    )
    tbl_idx = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.full(n, -1, jnp.int32)]
    )
    keys = tuple(arr[:, L - 1 - i] for i in range(L))  # msb-first lex order
    sorted_ = jax.lax.sort(keys + (is_input, tbl_idx), num_keys=L)
    s_limbs = jnp.stack(sorted_[:L], axis=1)
    s_inp, s_idx = sorted_[L], sorted_[L + 1]
    new_grp = jnp.concatenate(
        [
            jnp.ones(1, jnp.int32),
            jnp.any(s_limbs[1:] != s_limbs[:-1], axis=1).astype(jnp.int32),
        ]
    )
    gid = jnp.cumsum(new_grp) - 1
    seg_count = jax.ops.segment_sum(s_inp, gid, num_segments=2 * n)
    seg_idx = jax.ops.segment_max(s_idx, gid, num_segments=2 * n)
    invalid = jnp.any(jnp.logical_and(seg_count > 0, seg_idx < 0))
    m = (
        jnp.zeros(n, jnp.int32)
        .at[jnp.where(seg_idx >= 0, seg_idx, n)]
        .set(seg_count, mode="drop")
    )
    return m, invalid


import functools


@functools.partial(jax.jit, static_argnums=(1,))
def _counts_to_field(m: jnp.ndarray, spec=Fr) -> jnp.ndarray:
    """(n,) int32 counts -> (n, L) Montgomery limbs, on device."""
    limbs = jnp.zeros((m.shape[0], spec.num_limbs), jnp.uint32)
    mu = m.astype(jnp.uint32)
    limbs = limbs.at[:, 0].set(mu & 0xFFFF).at[:, 1].set(mu >> 16)
    return F.to_mont(spec, limbs)


def lookup_m_polys(
    compressed: Sequence[Tuple[jnp.ndarray, jnp.ndarray]], spec=None
) -> List[jnp.ndarray]:
    """prover.rs:139-192: m[idx] = multiplicity of table[idx] among inputs
    (idx = LAST index of each distinct table value). Fully on device — the
    previous host decode + dict loop was O(2^k) python on the critical path."""
    out = []
    for inp_d, tbl_d in compressed:
        m, invalid = _m_poly_counts(inp_d, tbl_d)
        if bool(invalid):
            raise ProofError("invalid lookup input")
        out.append(_counts_to_field(m, spec or Fr))
    return out


def lookup_h_polys(
    compressed: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    m_polys: Sequence[jnp.ndarray],
    gamma: int,
    spec=None,
) -> List[jnp.ndarray]:
    """prover.rs:194-250: h = 1/(gamma+input) - m/(gamma+table), batched
    inversions on device."""
    spec = spec or Fr
    g = jnp.asarray(spec.encode([gamma]))[0]
    out = []
    for (inp, tbl), m in zip(compressed, m_polys):
        n = inp.shape[0]
        both = jnp.concatenate([F.add(spec, inp, g[None, :]), F.add(spec, tbl, g[None, :])])
        inv = F.batch_inv(spec, both)
        h = F.sub(spec, inv[:n], F.mont_mul(spec, inv[n:], m))
        out.append(h)
        from halo2_lasso_tpu.config import sanity_enabled

        if sanity_enabled():  # prover.rs:245-247 (`sanity-check`): sum h == 0
            total = F.decode_scalar(spec, np.asarray(F.sum_reduce(spec, h)))
            assert total == 0, "lookup h poly does not sum to zero"
    return out


def permutation_z_polys(
    num_chunks: int,
    permutation_polys: Sequence[Tuple[int, jnp.ndarray]],
    polys: Sequence[jnp.ndarray],
    beta: int,
    gamma: int,
    spec=None,
) -> List[jnp.ndarray]:
    """prover.rs:252-345 semantics via parallel prefix product.

    products[j][b] = prod_{(poly,perm) in chunk j} (val + beta*id + gamma)
                     / (val + beta*perm + gamma);
    z_flat[t] for the (bh-order, chunk-interleaved) scan; z_polys by gather.
    """
    if not permutation_polys:
        return []
    spec = spec or Fr
    num_vars = polys[0].shape[0].bit_length() - 1
    n = 1 << num_vars
    chunk_size = -(-len(permutation_polys) // num_chunks)
    beta_d = jnp.asarray(spec.encode([beta]))[0]
    gamma_d = jnp.asarray(spec.encode([gamma]))[0]
    idx_dev = jnp.asarray(spec.encode(np.arange(n, dtype=object)))

    chunks = [
        list(permutation_polys[c * chunk_size : (c + 1) * chunk_size])
        for c in range(num_chunks)
    ]

    products = []
    global_idx = 0
    for chunk in chunks:
        denom = None
        numer = None
        for (poly_idx, perm_poly) in chunk:
            val = polys[poly_idx]
            d = F.add(
                spec, F.add(spec, val, F.mont_mul(spec, beta_d[None, :], perm_poly)), gamma_d[None, :]
            )
            denom = d if denom is None else F.mont_mul(spec, denom, d)
            id_off = jnp.asarray(spec.encode([global_idx << num_vars]))[0]
            id_vals = F.add(spec, idx_dev, id_off[None, :])
            nmr = F.add(
                spec, F.add(spec, val, F.mont_mul(spec, beta_d[None, :], id_vals)), gamma_d[None, :]
            )
            numer = nmr if numer is None else F.mont_mul(spec, numer, nmr)
            global_idx += 1
        products.append(F.mont_mul(spec, numer, F.batch_inv(spec, denom)))

    bh = BooleanHypercube(num_vars)
    seq = jnp.asarray(bh.iter_indices()[1:])  # (n-1,) bh order after 0
    # factor sequence f[t]: t = nth*num_chunks + j  ->  products[j][bh[nth+1]]
    gathered = [jnp.take(prod, seq, axis=0) for prod in products]  # each (n-1, L)
    interleaved = jnp.stack(gathered, axis=1).reshape((n - 1) * num_chunks, -1)
    prefix = jax.lax.associative_scan(
        lambda a, b: F.mont_mul(spec, a, b), interleaved, axis=0
    )
    one = jnp.broadcast_to(spec.one, (1, spec.num_limbs))
    zeros = jnp.zeros((num_chunks, spec.num_limbs), dtype=jnp.uint32)
    z_flat = jnp.concatenate(
        [zeros, one, prefix[: num_chunks * n - num_chunks - 1]], axis=0
    )
    from halo2_lasso_tpu.config import sanity_enabled

    if sanity_enabled():  # prover.rs:325-331: the grand product closes — the
        # product of every chunk's fraction over the whole hypercube is one
        total = prefix[-1]
        for prod in products:
            total = F.mont_mul(spec, total[None, :], prod[0][None, :])[0]
        assert (
            F.decode_scalar(spec, np.asarray(total)) == 1
        ), "permutation grand product does not close"

    nth_map = jnp.asarray(bh.nth_map() * num_chunks)
    return [
        jnp.take(z_flat, nth_map + offset, axis=0) for offset in range(num_chunks)
    ]


# ---------------------------------------------------------------------------
# zero-check driver + PCS query bookkeeping (shared with verifier)
# ---------------------------------------------------------------------------


def pcs_query(expression: Expression, num_instance_poly: int) -> List[Query]:
    """Sorted queries on committed polys (verifier.rs:147-153). BTreeSet
    order = (poly, rotation) lexicographic."""
    qs = [q for q in expression.used_query if q.poly >= num_instance_poly]
    return sorted(qs, key=lambda q: (q.poly, q.rotation))


def sorted_rotations(queries: Sequence[Query]) -> List[int]:
    return sorted({q.rotation for q in queries})


def point_offset(queries: Sequence[Query]) -> Dict[int, int]:
    """verifier.rs:168-182: offset of each rotation's point block."""
    rotations = sorted_rotations(queries)
    out = {}
    off = 0
    for r in rotations:
        out[r] = off
        off += 1 << abs(r)
    return out


def points_for_queries(p: int, queries: Sequence[Query], x: Sequence[int]) -> List[List[int]]:
    """verifier.rs:155-166: all rotated evaluation points, rotation-sorted."""
    pts = []
    for r in sorted_rotations(queries):
        pts.extend(mle.rotation_eval_points(p, list(x), r))
    return pts


def prove_sum_check(
    num_instance_poly: int,
    expression: Expression,
    sum_: int,
    polys: Sequence[jnp.ndarray],
    challenges: Sequence[int],
    y: Sequence[int],
    transcript,
    spec=None,
) -> Tuple[List[List[int]], List[Evaluation]]:
    """prover.rs:347-409: run the zero/sum check, evaluate rotated queries,
    write eval values, return (points, Evaluations)."""
    spec = spec or Fr
    p = spec.modulus
    num_vars = polys[0].shape[0].bit_length() - 1
    vp = sum_check.VirtualPolynomial(expression, polys, challenges, [list(y)])
    x, final_evals = sum_check.prove(spec, num_vars, vp, sum_, transcript)

    queries = pcs_query(expression, num_instance_poly)
    offsets = point_offset(queries)

    evals: List[Evaluation] = []
    for q in queries:
        if q.rotation == 0:
            vals = [final_evals[q.poly]]
        else:
            vals = mle.evaluate_for_rotation(spec, polys[q.poly], x, q.rotation)
        for i, v in enumerate(vals):
            evals.append(Evaluation(q.poly, offsets[q.rotation] + i, v))

    transcript.write_field_elements([e.value for e in evals])
    return points_for_queries(p, queries, x), evals


def prove_zero_check(
    num_instance_poly, expression, polys, challenges, y, transcript, spec=None
):
    return prove_sum_check(
        num_instance_poly, expression, 0, polys, challenges, y, transcript, spec=spec
    )
