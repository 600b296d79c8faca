"""Sumcheck PIOP, EvaluationsProver semantics, TPU-native.

Protocol compatibility with the reference classic sumcheck
(/root/reference/plonkish_backend/src/piop/sum_check/classic.rs,
classic/eval.rs): each round writes the round-polynomial's evaluations at
t = 0..degree to the transcript (evals[0] derived as sum - evals[1],
eval.rs:129), squeezes a challenge, folds every table with fix_var; the
verifier checks evals[0]+evals[1] == claimed sum and barycentric-interpolates
at the challenge (eval.rs:49-57).

TPU-native design (not a port):
  * ALL leaf tables — witness polys (with rotations pre-materialized by one
    gather), eq_xy tables, the Identity column, Lagrange indicators — are
    plain MLEs folded by the same vectorized `fix_var`. (Identity and
    one-hot Lagrange columns are multilinear, so folding them is exact; this
    replaces the reference's per-leaf incremental "step" bookkeeping,
    eval.rs:210-307, with one uniform data path XLA can fuse.)
  * The round message evaluates the traced expression at d points over all
    half-pairs in one fused elementwise pass per point, then tree-reduces
    (lazy-carry sum). Round r costs O(2^(k-r) * d * |expr|) field-muls of
    pure VPU work; cross-device it becomes a psum (see parallel/).
  * Host <-> device traffic per round: (d) field elements out, 1 challenge in
    — the unavoidable Fiat-Shamir sync point.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.expression import Expression, Query
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.field import FieldSpec
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.poly.bh import BooleanHypercube
from halo2_lasso_tpu.transcript import Keccak256Transcript, TranscriptError


from halo2_lasso_tpu.errors import Halo2LassoError


class SumcheckError(Halo2LassoError):
    pass


# ---------------------------------------------------------------------------
# host scalar helpers
# ---------------------------------------------------------------------------


def barycentric_weights(p: int, points: Sequence[int]) -> List[int]:
    ws = []
    for j, pj in enumerate(points):
        w = 1
        for i, pi in enumerate(points):
            if i != j:
                w = w * (pj - pi) % p
        ws.append(pow(w, -1, p))
    return ws


def barycentric_interpolate(
    p: int, weights: Sequence[int], points: Sequence[int], evals: Sequence[int], x: int
) -> int:
    coeffs = [pow((x - pt) % p, -1, p) * w % p for pt, w in zip(points, weights)]
    s = sum(coeffs) % p
    num = sum(c * e for c, e in zip(coeffs, evals)) % p
    return num * pow(s, -1, p) % p


def evaluate_at_point(
    expr: Expression,
    p: int,
    num_vars: int,
    evals: Dict[Query, int],
    challenges: Sequence[int],
    ys: Sequence[Sequence[int]],
    x: Sequence[int],
) -> int:
    """Verifier-side evaluation of the composed expression at point x
    (piop/sum_check.rs:60-98 semantics)."""
    bh_seq = BooleanHypercube(num_vars).iter_indices()
    identity = mle.identity_eval_host(p, x)
    eq_vals = [mle.eq_xy_eval_host(p, x, y) for y in ys]

    def leaf(kind, arg):
        if kind == "identity":
            return identity
        if kind == "lagrange":
            b = int(bh_seq[arg % (1 << num_vars)])
            return mle.lagrange_eval_host(p, x, b)
        if kind == "eq_xy":
            return eq_vals[arg]
        if kind == "poly":
            return evals[arg]
        raise ValueError(kind)

    from halo2_lasso_tpu.expression import evaluate_host

    return evaluate_host(expr, p, leaf, list(challenges))


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


class VirtualPolynomial:
    """expression over polys (device (2^k, L) arrays) + challenges + ys (host ints)."""

    def __init__(
        self,
        expression: Expression,
        polys: Sequence[jnp.ndarray],
        challenges: Sequence[int],
        ys: Sequence[Sequence[int]],
    ):
        self.expression = expression
        self.polys = list(polys)
        self.challenges = list(challenges)
        self.ys = [list(y) for y in ys]


_round_fn_cache: Dict[Tuple, object] = {}
_fold_fn_cache: Dict[Tuple, object] = {}
_pallas_cache: Dict[Tuple, object] = {}


def _pallas_enabled() -> bool:
    """Use the fused limbs-first Pallas kernels for large rounds when running
    on an accelerator (opt-out via HALO2_LASSO_TPU_PALLAS=0)."""
    import os

    if os.environ.get("HALO2_LASSO_TPU_PALLAS", "1") == "0":
        return False
    return jax.devices()[0].platform != "cpu"


def _leaf_keys(expression: Expression, num_polys: int):
    keys = [("poly", i, 0) for i in range(num_polys)]
    for q in sorted(expression.used_query, key=lambda q: (q.poly, q.rotation)):
        if q.rotation != 0:
            keys.append(("poly", q.poly, q.rotation))
    for idx in sorted(expression.used_eq_xy):
        keys.append(("eq", idx))
    if expression.used_identity:
        keys.append(("identity",))
    for i in sorted(expression.used_lagrange):
        keys.append(("lagrange", i))
    return keys


def _challenge_only_leaf(kind, arg):
    raise ValueError("coefficient expressions must be challenge-only")


def _term_leaf_keys(term: Expression):
    """Leaf-array keys a single term reads."""
    keys = [("poly", q.poly, q.rotation) for q in term.used_query]
    keys += [("eq", i) for i in term.used_eq_xy]
    if term.used_identity:
        keys.append(("identity",))
    keys += [("lagrange", i) for i in term.used_lagrange]
    return keys


def _chunk_max_muls() -> int:
    """Per-XLA-module multiplication budget for the chunked round evaluation.
    Bounds compile size/time for arbitrarily large composed expressions (the
    structural fix for this image's jaxlib large-module instability)."""
    import os

    return int(os.environ.get("HALO2_LASSO_TPU_CHUNK_MULS", "24"))


def _pack_term_chunks(coeff_terms, max_muls: int) -> List[List[int]]:
    """Greedily group term indices so each chunk traces <= max_muls field
    multiplications per evaluation point."""
    chunks: List[List[int]] = []
    cur: List[int] = []
    cur_muls = 0
    for i, (_, term) in enumerate(coeff_terms):
        m = max(1, term.mul_count)
        if cur and cur_muls + m > max_muls:
            chunks.append(cur)
            cur, cur_muls = [], 0
        cur.append(i)
        cur_muls += m
    if cur:
        chunks.append(cur)
    return chunks


def _make_chunk_fn(spec: FieldSpec, terms: Sequence[Expression], degree: int):
    """arrays dict -> (degree, num_terms, L) per-term column sums at
    t = 1..degree. The alpha/coefficient combination happens on host
    (round message is linear in the terms)."""

    def leaf_builder(values):
        def leaf(kind, arg):
            if kind == "identity":
                return values[("identity",)]
            if kind == "lagrange":
                return values[("lagrange", arg)]
            if kind == "eq_xy":
                return values[("eq", arg)]
            if kind == "poly":
                return values[("poly", arg.poly, arg.rotation)]
            raise ValueError(kind)

        return leaf

    from halo2_lasso_tpu.expression import evaluate_jnp

    used = []
    for t in terms:
        for k in _term_leaf_keys(t):
            if k not in used:
                used.append(k)

    def chunk_fn(arrays: Dict, challenges: List[jnp.ndarray]):
        e1 = {k: arrays[k][1::2] for k in used}
        half = arrays[used[0]].shape[0] // 2 if used else 1
        step = (
            {k: F.sub(spec, e1[k], arrays[k][0::2]) for k in used}
            if degree > 1
            else None
        )
        half_c = jnp.asarray(spec.encode([half]))[0]
        outs = []
        values = e1
        for t in range(1, degree + 1):
            if t > 1:
                values = {k: F.add(spec, values[k], step[k]) for k in used}
            row = []
            for term in terms:
                v = evaluate_jnp(spec, term, leaf_builder(values), challenges)
                if v.ndim == 1:
                    # hypercube-constant term: sum over half-pairs = half * v
                    v = F.mont_mul(spec, v, half_c)
                else:
                    v = F.sum_reduce(spec, v)
                row.append(v)
            outs.append(jnp.stack(row))
        return jnp.stack(outs)

    chunk_fn.__name__ = f"chunk_fn_{len(terms)}t"
    return jax.jit(chunk_fn)


def host_tail_size(num_arrays: int = 5) -> int:
    """Hypercube size at/below which sumcheck rounds run on the host.

    The tail trades device round-trips (~25ms each through the TPU tunnel)
    against ONE stacked pull whose cost is bandwidth-bound (~25ms/MB
    measured): pulled bytes = num_arrays * size * 64. With the C field
    kernels (ops/host_field.py, ~25M muls/s) host compute is noise, so the
    threshold is set by a pull-size budget; the numpy object-int fallback
    (~2M muls/s) keeps the fixed round-2 threshold."""
    env = os.environ.get("HALO2_LASSO_TPU_HOST_TAIL")
    if env is not None:
        return int(env)
    from halo2_lasso_tpu.ops import host_field

    if not host_field.available():
        return 1024
    budget = int(os.environ.get("HALO2_LASSO_TPU_HOST_TAIL_MB", "4")) << 20
    size = budget // (max(1, num_arrays) * 64)
    size = 1 << (size.bit_length() - 1)  # pow2 floor
    return max(1024, min(16384, size))


def _host_tail_pull(spec: FieldSpec, arrays: Dict):
    """ONE stacked device->host pull of every leaf table.

    With the C backend the pull is a vectorized repack into packed-Montgomery
    HVecs (no per-element bigint decode loop); fallback is object ints."""
    from halo2_lasso_tpu.ops import host_field

    hkeys = sorted(arrays.keys())
    stacked = jnp.stack([arrays[k] for k in hkeys])
    raw = np.asarray(stacked)
    if host_field.available(spec):
        ctx = host_field.ctx_for(spec)
        return {k: ctx.from_dev(raw[i]) for i, k in enumerate(hkeys)}
    flat = spec.decode(raw)  # (K, size) object
    return {k: flat[i] for i, k in enumerate(hkeys)}


def _host_fold(v, r: int, p: int):
    """fix_var on a host tail array (HVec or object ints)."""
    from halo2_lasso_tpu.ops.host_field import HVec

    if isinstance(v, HVec):
        return v.fold_pairs(r)
    return (v[0::2] + (v[1::2] - v[0::2]) * r) % p


def _host_sum(v, half: int, p: int) -> int:
    """Column sum of an evaluate_host result (HVec / object array / scalar)."""
    from halo2_lasso_tpu.ops.host_field import HVec

    if isinstance(v, HVec):
        return v.sum_int()
    if np.ndim(v) == 0:
        return int(v) * half % p
    return int(np.sum(v)) % p


def _host_round_msg(
    p: int, coeff_terms, coeff_vals, host_arrays: Dict, challenges, degree: int
) -> List[int]:
    """Round message (t = 1..degree) over HOST object-int tables — exact
    mod-p twin of _make_chunk_fn. Below the host-tail threshold the
    remaining rounds cost microseconds of bigint math; running them on the
    host removes the 2-3 device round-trips per round that dominate small
    rounds through the device tunnel (~2s of pure RTT per sumcheck at
    nv=16 before this)."""
    from halo2_lasso_tpu.expression import evaluate_host

    lo = {k: v[0::2] for k, v in host_arrays.items()}
    e1 = {k: v[1::2] for k, v in host_arrays.items()}
    half = len(next(iter(e1.values()))) if e1 else 1
    step = {k: e1[k] - lo[k] for k in e1}

    def leaf_builder(values):
        def leaf(kind, arg):
            if kind == "identity":
                return values[("identity",)]
            if kind == "lagrange":
                return values[("lagrange", arg)]
            if kind == "eq_xy":
                return values[("eq", arg)]
            if kind == "poly":
                return values[("poly", arg.poly, arg.rotation)]
            raise ValueError(kind)

        return leaf

    msg_tail = []
    values = e1
    for t in range(1, degree + 1):
        if t > 1:
            values = {k: (values[k] + step[k]) % p for k in values}
        total = 0
        for i, (_, term) in enumerate(coeff_terms):
            v = evaluate_host(term, p, leaf_builder(values), challenges)
            total += coeff_vals[i] * _host_sum(v, half, p)
        msg_tail.append(total % p)
    return msg_tail


def _sharded_round(
    spec: FieldSpec,
    mesh,
    arrays: Dict,
    chal_stack: jnp.ndarray,
    num_challenges: int,
    coeff_terms,
    coeff_vals,
    chunk_lists,
    degree: int,
    size: int,
) -> List[int]:
    """One sharded round message (t=1..degree tail), chunked like the
    single-device path; per-chunk psum inside the sharded kernel, host
    alpha-combination of the per-term sums."""
    from halo2_lasso_tpu.parallel import sharding as shd

    p = spec.modulus
    chunk_outs = []
    for idxs in chunk_lists:
        terms = [coeff_terms[i][1] for i in idxs]
        cache_key = (
            "sharded",
            spec.name,
            id(mesh),
            tuple(t.structural_key for t in terms),
            degree,
            size,
            num_challenges,
        )
        fn = _round_fn_cache.get(cache_key)
        if fn is None:
            fn = shd.make_sharded_chunk_fn(spec, mesh, terms, degree, num_challenges)
            _round_fn_cache[cache_key] = fn
        # shard_map's in_specs cover exactly the chunk's used leaf keys —
        # pass that subset (a full-dict arg trips the pytree key check when
        # a chunk doesn't touch every leaf, e.g. lasso-heavy expressions)
        used = []
        for t in terms:
            for k in _term_leaf_keys(t):
                if k not in used:
                    used.append(k)
        chunk_outs.append((idxs, fn({k: arrays[k] for k in used}, chal_stack)))
    msg_tail = [0] * degree
    for idxs, out in chunk_outs:
        vals = spec.decode(np.asarray(out))  # (degree, T) object ints
        for t in range(degree):
            for j, i in enumerate(idxs):
                msg_tail[t] += coeff_vals[i] * int(vals[t][j])
    return [v % p for v in msg_tail]


def _prove_host(
    spec: FieldSpec,
    num_vars: int,
    virtual_poly: VirtualPolynomial,
    sum_: int,
    transcript: Keccak256Transcript,
) -> Tuple[List[int], List[int]]:
    """Fully-host sumcheck over packed-Montgomery HVec polys (C kernels).

    Used for small instances whose data already lives on the host — most
    importantly the GKR layer tree's upper layers, whose per-layer device
    sumchecks were pure tunnel RTT. Proof bytes identical to the device
    path. Rotated queries are unsupported (no caller needs them here)."""
    from halo2_lasso_tpu.expression import evaluate_host, split_challenge_terms
    from halo2_lasso_tpu.ops import host_field
    from halo2_lasso_tpu.ops.host_field import HVec

    expression = virtual_poly.expression
    degree = expression.degree
    p = spec.modulus
    ctx = host_field.ctx_for(spec)
    bh = BooleanHypercube(num_vars)
    keys = _leaf_keys(expression, len(virtual_poly.polys))
    host_arrays: Dict[Tuple, HVec] = {}
    for key in keys:
        if key[0] == "poly":
            _, i, rot = key
            if rot != 0:
                raise SumcheckError("host-input sumcheck does not support rotations")
            host_arrays[key] = virtual_poly.polys[i]
        elif key[0] == "eq":
            host_arrays[key] = ctx.eq_expand(virtual_poly.ys[key[1]])
        elif key[0] == "identity":
            host_arrays[key] = ctx.from_ints(list(range(1 << num_vars)))
        elif key[0] == "lagrange":
            b = int(bh.iter_indices()[key[1] % (1 << num_vars)])
            arr = np.zeros((1 << num_vars, 4), dtype=np.uint64)
            arr[b] = ctx.one4
            host_arrays[key] = HVec(ctx, arr)
        else:
            raise ValueError(key)

    coeff_terms = split_challenge_terms(expression, p)
    coeff_vals = [
        evaluate_host(c, p, _challenge_only_leaf, virtual_poly.challenges)
        for c, _ in coeff_terms
    ]
    challenges: List[int] = []
    current_sum = sum_ % p
    points = list(range(degree + 1))
    weights = barycentric_weights(p, points)
    for _ in range(num_vars):
        msg_tail = _host_round_msg(
            p, coeff_terms, coeff_vals, host_arrays,
            list(virtual_poly.challenges), degree,
        )
        evals = [(current_sum - msg_tail[0]) % p] + msg_tail
        transcript.write_field_elements(evals)
        r = transcript.squeeze_challenge()
        challenges.append(r)
        current_sum = barycentric_interpolate(p, weights, points, evals, r)
        host_arrays = {k: _host_fold(v, r, p) for k, v in host_arrays.items()}
    return challenges, [
        host_arrays[("poly", i, 0)].to_int(0)
        for i in range(len(virtual_poly.polys))
    ]


def _make_fold_fn(spec: FieldSpec):
    def fold_fn(arrays: Dict, challenge: jnp.ndarray):
        return {k: mle.fix_var(spec, v, challenge) for k, v in arrays.items()}

    return jax.jit(fold_fn)


def prove(
    spec: FieldSpec,
    num_vars: int,
    virtual_poly: VirtualPolynomial,
    sum_: int,
    transcript: Keccak256Transcript,
) -> Tuple[List[int], List[int]]:
    """Run the sumcheck prover; returns (challenges, final poly evals as ints).

    Mirrors ClassicSumCheck::prove (classic.rs:208-240) — message per round,
    squeeze, fold — with the uniform-MLE state described in the module doc.
    """
    expression = virtual_poly.expression
    degree = expression.degree
    p = spec.modulus
    assert num_vars > 0 and expression.max_used_rotation_distance() <= num_vars
    bh = BooleanHypercube(num_vars)

    from halo2_lasso_tpu.ops.host_field import HVec

    # HOST-INPUT mode: polys already live on the host as packed-Montgomery
    # HVecs (e.g. the GKR layer tree's small layers) — build every leaf on
    # host and run the whole sumcheck with ZERO device interaction.
    # Identical proof bytes to the device path.
    host_input = bool(virtual_poly.polys) and isinstance(virtual_poly.polys[0], HVec)
    if host_input:
        return _prove_host(spec, num_vars, virtual_poly, sum_, transcript)

    # ---- build leaf arrays ----
    keys = _leaf_keys(expression, len(virtual_poly.polys))
    arrays: Dict[Tuple, jnp.ndarray] = {}
    for key in keys:
        if key[0] == "poly":
            _, i, rot = key
            arr = virtual_poly.polys[i]
            if rot != 0:
                arr = mle.rotate_evals(spec, arr, rot)
            arrays[key] = arr
        elif key[0] == "eq":
            y = virtual_poly.ys[key[1]]
            yd = jnp.asarray(spec.encode(y))
            arrays[key] = mle.eq_xy(spec, yd)
        elif key[0] == "identity":
            idx = np.arange(1 << num_vars, dtype=object)
            arrays[key] = jnp.asarray(spec.encode(idx))
        elif key[0] == "lagrange":
            i = key[1]
            b = int(bh.iter_indices()[i % (1 << num_vars)])
            onehot = np.zeros(1 << num_vars, dtype=object)
            onehot[:] = 0
            onehot[b] = 1
            arrays[key] = jnp.asarray(spec.encode(onehot))
        else:
            raise ValueError(key)

    challenges_dev = [
        jnp.asarray(spec.encode([c]))[0] for c in virtual_poly.challenges
    ]

    # STRUCTURAL key: provers rebuild structurally-identical Expression
    # objects every proof; an id()-based key made every per-round pallas
    # kernel miss the in-process cache, re-loading ~16 XLA modules per
    # sumcheck through the device tunnel (~2s each — 32s of pure reload per
    # Lasso primary sumcheck at nv=16)
    expr_key = expression.structural_key
    fold_fn = _fold_fn_cache.setdefault(spec.name, _make_fold_fn(spec))

    # chunked round evaluation: undo the top-level challenge batching so each
    # XLA module stays small (see split_challenge_terms / _pack_term_chunks)
    from halo2_lasso_tpu.expression import evaluate_host, split_challenge_terms

    coeff_terms = split_challenge_terms(expression, p)
    coeff_vals = [
        evaluate_host(c, p, _challenge_only_leaf, virtual_poly.challenges)
        for c, _ in coeff_terms
    ]
    chunk_lists = _pack_term_chunks(coeff_terms, _chunk_max_muls())

    challenges: List[int] = []
    current_sum = sum_ % p
    points = list(range(degree + 1))
    weights = barycentric_weights(p, points)

    # pallas fast path: limbs-first tables + fused kernels for big rounds.
    # The fused ROUND kernel holds every leaf table's lo/hi tiles in scoped
    # VMEM at once; wide states (ARX: 70+ leaves) exceed the 16MB limit and
    # crash the server-side Mosaic compile (measured 18.25MB at 73 leaves),
    # so those fall back to the chunked-jnp path (XLA tiles it freely).
    PALLAS_MIN = 4096
    PALLAS_MAX_LEAVES = int(os.environ.get("HALO2_LASSO_TPU_PALLAS_MAX_LEAVES", "40"))
    use_pallas = (
        _pallas_enabled()
        and (1 << num_vars) >= PALLAS_MIN
        and len(keys) <= PALLAS_MAX_LEAVES
    )
    lf_tables = None
    chal_lf = None
    HOST_TAIL = host_tail_size(len(arrays))
    if use_pallas:
        from halo2_lasso_tpu.ops import pallas_field as PF

        lf_tables = {k: PF.to_lf(v) for k, v in arrays.items()}
        # the uint32 row-major copies are re-derived from the lf tables at
        # the pallas->host/jnp transitions; keeping both doubles HBM for
        # the largest sumchecks (4GB at a k=20 GKR bottom layer)
        arrays = None
        if virtual_poly.challenges:
            chal_lf = jnp.asarray(spec.encode(list(virtual_poly.challenges)))

    # multi-chip: shard the hypercube axis over the active mesh (see
    # parallel/sharding.py). Rounds stay sharded while every shard holds at
    # least one fold pair; the tiny tail is replicated and follows the
    # single-device path. Proof bytes are identical either way.
    from halo2_lasso_tpu.parallel import sharding as shd

    mesh = shd.active_mesh()
    sharded_now = False
    if mesh is not None and not use_pallas and (1 << num_vars) >= 2 * mesh.size:
        arrays = {k: shd.shard_evals(mesh, v) for k, v in arrays.items()}
        chal_stack = (
            jnp.asarray(spec.encode(list(virtual_poly.challenges)))
            if virtual_poly.challenges
            else jnp.zeros((0, spec.num_limbs), jnp.uint32)
        )
        chal_stack = shd.replicate(mesh, chal_stack)
        sharded_now = True

    # below HOST_TAIL (computed above) the remaining rounds run on HOST
    # (C field kernels or object-int fallback): one stacked pull, zero
    # further device round-trips (matching proof bytes exactly)
    host_arrays = None

    for rnd in range(num_vars):
        size = 1 << (num_vars - rnd)

        if sharded_now and size < 2 * mesh.size:
            # tail: gather to replication, continue single-device path
            arrays = {k: shd.replicate(mesh, v) for k, v in arrays.items()}
            sharded_now = False

        if host_arrays is None and not sharded_now and size <= HOST_TAIL:
            if lf_tables is not None:
                from halo2_lasso_tpu.ops import pallas_field as PF

                arrays = {k: PF.from_lf(v) for k, v in lf_tables.items()}
                lf_tables = None
            host_arrays = _host_tail_pull(spec, arrays)

        if host_arrays is not None:
            msg_tail = _host_round_msg(
                p,
                coeff_terms,
                coeff_vals,
                host_arrays,
                list(virtual_poly.challenges),
                degree,
            )
        elif sharded_now:
            msg_tail = _sharded_round(
                spec,
                mesh,
                arrays,
                chal_stack,
                len(virtual_poly.challenges),
                coeff_terms,
                coeff_vals,
                chunk_lists,
                degree,
                size,
            )
        elif use_pallas and size >= PALLAS_MIN:
            from halo2_lasso_tpu.ops import pallas_field as PF

            pkey = ("msg", spec.name, expr_key, degree, len(keys), size)
            pfn = _pallas_cache.get(pkey)
            if pfn is None:
                pfn = PF.make_sumcheck_round(
                    spec,
                    expression,
                    keys,
                    degree,
                    num_challenges=len(virtual_poly.challenges),
                    include_fold=False,
                )
                _pallas_cache[pkey] = pfn
            msg_dev, _ = pfn(lf_tables, None, chal_lf)
            msg_tail = [int(v) for v in spec.decode(np.asarray(msg_dev))]
        else:
            if lf_tables is not None:  # dropped below the pallas threshold
                from halo2_lasso_tpu.ops import pallas_field as PF

                arrays = {k: PF.from_lf(v) for k, v in lf_tables.items()}
                lf_tables = None
            chunk_outs = []
            for idxs in chunk_lists:
                terms = [coeff_terms[i][1] for i in idxs]
                cache_key = (
                    spec.name,
                    tuple(t.structural_key for t in terms),
                    degree,
                    size,
                    len(challenges_dev),
                )
                chunk_fn = _round_fn_cache.get(cache_key)
                if chunk_fn is None:
                    chunk_fn = _make_chunk_fn(spec, terms, degree)
                    _round_fn_cache[cache_key] = chunk_fn
                chunk_outs.append((idxs, chunk_fn(arrays, challenges_dev)))
            # host alpha-combination of per-term column sums
            msg_tail = [0] * degree
            for idxs, out in chunk_outs:
                vals = spec.decode(np.asarray(out))  # (degree, T) object ints
                for t in range(degree):
                    for j, i in enumerate(idxs):
                        msg_tail[t] += coeff_vals[i] * int(vals[t][j])
            msg_tail = [v % p for v in msg_tail]
        evals = [(current_sum - msg_tail[0]) % p] + msg_tail
        transcript.write_field_elements(evals)

        r = transcript.squeeze_challenge()
        challenges.append(r)
        current_sum = barycentric_interpolate(p, weights, points, evals, r)

        if host_arrays is not None:
            host_arrays = {k: _host_fold(v, r, p) for k, v in host_arrays.items()}
            continue
        r_dev = jnp.asarray(spec.encode([r]))[0]
        if sharded_now:
            skey = ("sfold", spec.name, id(mesh), tuple(sorted(arrays)))
            sfn = _round_fn_cache.get(skey)
            if sfn is None:
                sfn = shd.make_sharded_fold_fn(spec, mesh, sorted(arrays))
                _round_fn_cache[skey] = sfn
            arrays = sfn(arrays, shd.replicate(mesh, r_dev))
        elif lf_tables is not None:
            from halo2_lasso_tpu.ops import pallas_field as PF

            fkey = ("fold", spec.name, expr_key, len(keys), size)
            ffn = _pallas_cache.get(fkey)
            if ffn is None:
                ffn = PF.make_fold_all(spec, keys)
                _pallas_cache[fkey] = ffn
            lf_tables = ffn(lf_tables, r_dev[:, None])
        else:
            arrays = fold_fn(arrays, r_dev)

    if host_arrays is not None:
        from halo2_lasso_tpu.ops.host_field import HVec

        return challenges, [
            v.to_int(0) if isinstance(v, HVec) else int(v[0]) % p
            for v in (
                host_arrays[("poly", i, 0)]
                for i in range(len(virtual_poly.polys))
            )
        ]

    if lf_tables is not None:
        from halo2_lasso_tpu.ops import pallas_field as PF

        arrays = {k: PF.from_lf(v) for k, v in lf_tables.items()}

    # one stacked device->host pull for every final eval (a per-poly pull
    # costs one tunnel round-trip each — dozens of ms of pure latency)
    stacked = jnp.stack(
        [arrays[("poly", i, 0)][0] for i in range(len(virtual_poly.polys))]
    )
    final_evals = [int(v) for v in spec.decode(np.asarray(stacked))]
    return challenges, final_evals


# ---------------------------------------------------------------------------
# coefficients prover (degree-2, for PCS additive batch-open)
# ---------------------------------------------------------------------------


def _make_coeff_round_fn(spec: FieldSpec):
    """Jitted round kernel for expressions sum_j scalar_j * eq_j * poly_j:
    per-term (c0_j, c2_j) column sums (coeff.rs:152-203 Karatsuba, LAZY
    mode: c1 recovered from the claimed sum).

    Terms arrive STACKED: eqs/polys (T, n, L). One vectorized mul + one
    axis-1 reduction covers every term, so the XLA module size is constant
    in T (the earlier per-term unroll inlined 2*T mont_mul graphs, which
    this jaxlib's LLVM codegen segfaults on past ~tens of terms)."""

    def round_fn(eqs: jnp.ndarray, polys: jnp.ndarray):
        e0, e1 = eqs[:, 0::2], eqs[:, 1::2]
        p0, p1 = polys[:, 0::2], polys[:, 1::2]
        c0 = F.sum_reduce(spec, F.mont_mul(spec, e0, p0), axis=1)
        c2 = F.sum_reduce(
            spec,
            F.mont_mul(spec, F.sub(spec, e1, e0), F.sub(spec, p1, p0)),
            axis=1,
        )
        return c0, c2

    return jax.jit(round_fn)


def _make_coeff_fold_fn(spec: FieldSpec):
    """fix_var on a (T, n, L) stacked table (same pairing as mle.fix_var)."""

    def fold_fn(stacked: jnp.ndarray, x: jnp.ndarray):
        e0, e1 = stacked[:, 0::2], stacked[:, 1::2]
        return F.add(
            spec, F.mont_mul(spec, F.sub(spec, e1, e0), x[None, None, :]), e0
        )

    return jax.jit(fold_fn)


_coeff_fn_cache: Dict[Tuple, object] = {}


def prove_coeff_products(
    spec: FieldSpec,
    num_vars: int,
    terms: Sequence[Tuple[int, jnp.ndarray, jnp.ndarray]],
    sum_: int,
    transcript: Keccak256Transcript,
) -> Tuple[List[int], List[jnp.ndarray]]:
    """Sumcheck with COEFFICIENT round messages for expressions of the exact
    shape sum_j scalar_j * eq_j(X) * poly_j(X) (degree 2) — the batch-open
    expression (pcs/multilinear.rs:186-201). Message per round: [c0, c1, c2]
    with c1 = sum - 2*c0 - c2 (coeff.rs:137-147).

    terms: (scalar int, eq table array, poly array). Returns (challenges,
    final folded poly arrays [each (1, L)]).
    """
    p = spec.modulus
    eqs = jnp.stack([t[1] for t in terms])  # (T, n, L)
    polys = jnp.stack([t[2] for t in terms])
    scalars = [t[0] % p for t in terms]

    from halo2_lasso_tpu.parallel import sharding as shd

    mesh = shd.active_mesh()
    sharded_now = False
    if mesh is not None and (1 << num_vars) >= 2 * mesh.size:
        eqs = shd.shard_evals_axis1(mesh, eqs)
        polys = shd.shard_evals_axis1(mesh, polys)
        sharded_now = True

    challenges: List[int] = []
    current_sum = sum_ % p
    # host tail (same rationale as the EvaluationsProver host tail: small
    # rounds are pure tunnel-RTT; one stacked pull, zero further device
    # round-trips, identical proof bytes). C kernels when available.
    T = eqs.shape[0]
    HOST_TAIL = host_tail_size(2 * T)
    host_eqs = host_polys = None
    from halo2_lasso_tpu.ops import host_field
    from halo2_lasso_tpu.ops.host_field import HVec

    for rnd in range(num_vars):
        size = 1 << (num_vars - rnd)
        if sharded_now and size < 2 * mesh.size:
            eqs = shd.replicate(mesh, eqs)
            polys = shd.replicate(mesh, polys)
            sharded_now = False
        if host_eqs is None and not sharded_now and size <= HOST_TAIL:
            raw = np.asarray(jnp.concatenate([eqs, polys]))
            if host_field.available(spec):
                ctx = host_field.ctx_for(spec)
                packed = ctx.pack_u32(raw)  # (2T, n, 4)
                host_eqs = [HVec(ctx, packed[j]) for j in range(T)]
                host_polys = [HVec(ctx, packed[T + j]) for j in range(T)]
            else:
                both = spec.decode(raw)
                host_eqs, host_polys = both[:T], both[T:]
        if host_eqs is not None and isinstance(host_eqs, list):
            c0l, c2l = [], []
            for j in range(T):
                e0, e1 = host_eqs[j][0::2], host_eqs[j][1::2]
                p0, p1 = host_polys[j][0::2], host_polys[j][1::2]
                c0l.append(e0.dot_int(p0))
                c2l.append(e0.dot_diff_int(e1, p0, p1))
        elif host_eqs is not None:
            e0h, e1h = host_eqs[:, 0::2], host_eqs[:, 1::2]
            p0h, p1h = host_polys[:, 0::2], host_polys[:, 1::2]
            c0l = [int(np.sum(e0h[j] * p0h[j]) % p) for j in range(T)]
            c2l = [
                int(np.sum((e1h[j] - e0h[j]) * (p1h[j] - p0h[j])) % p)
                for j in range(T)
            ]
        elif sharded_now:
            key = ("sharded", spec.name, id(mesh))
            round_fn = _coeff_fn_cache.get(key)
            if round_fn is None:
                round_fn = shd.make_sharded_coeff_fn(spec, mesh)
                _coeff_fn_cache[key] = round_fn
        else:
            key = (spec.name,)
            round_fn = _coeff_fn_cache.get(key)
            if round_fn is None:
                round_fn = _make_coeff_round_fn(spec)
                _coeff_fn_cache[key] = round_fn
        if host_eqs is None:
            c0d, c2d = round_fn(eqs, polys)
            # single device->host pull per round (two pulls = two RTTs)
            both = spec.decode(np.asarray(jnp.concatenate([c0d, c2d])))
            c0l = [int(v) for v in both[: c0d.shape[0]]]
            c2l = [int(v) for v in both[c0d.shape[0] :]]
        c0 = sum(s * v for s, v in zip(scalars, c0l)) % p
        c2 = sum(s * v for s, v in zip(scalars, c2l)) % p
        c1 = (current_sum - 2 * c0 - c2) % p
        transcript.write_field_elements([c0, c1, c2])

        r = transcript.squeeze_challenge()
        challenges.append(r)
        current_sum = (c0 + c1 * r + c2 * r * r) % p

        if host_eqs is not None and isinstance(host_eqs, list):
            host_eqs = [v.fold_pairs(r) for v in host_eqs]
            host_polys = [v.fold_pairs(r) for v in host_polys]
            continue
        if host_eqs is not None:
            host_eqs = (host_eqs[:, 0::2] + (host_eqs[:, 1::2] - host_eqs[:, 0::2]) * r) % p
            host_polys = (
                host_polys[:, 0::2] + (host_polys[:, 1::2] - host_polys[:, 0::2]) * r
            ) % p
            continue
        r_dev = jnp.asarray(spec.encode([r]))[0]
        if sharded_now:
            fkey = ("sfold", spec.name, id(mesh))
            sfn = _coeff_fn_cache.get(fkey)
            if sfn is None:
                sfn = shd.make_sharded_coeff_fold_fn(spec, mesh)
                _coeff_fn_cache[fkey] = sfn
            eqs = sfn(eqs, shd.replicate(mesh, r_dev))
            polys = sfn(polys, shd.replicate(mesh, r_dev))
        else:
            fkey = ("fold", spec.name)
            ffn = _coeff_fn_cache.get(fkey)
            if ffn is None:
                ffn = _make_coeff_fold_fn(spec)
                _coeff_fn_cache[fkey] = ffn
            eqs = ffn(eqs, r_dev)
            polys = ffn(polys, r_dev)

    if host_polys is not None and isinstance(host_polys, list):
        return challenges, [
            jnp.asarray(host_polys[j][0:1].to_dev_limbs()) for j in range(T)
        ]
    if host_polys is not None:
        return challenges, [
            jnp.asarray(spec.encode([int(host_polys[j][0]) % p]))
            for j in range(T)
        ]
    return challenges, [polys[i] for i in range(polys.shape[0])]


def verify_coeff(
    p: int,
    num_vars: int,
    degree: int,
    sum_: int,
    transcript: Keccak256Transcript,
) -> Tuple[int, List[int]]:
    """Verifier for coefficient round messages: consistency via
    2*c0 + c1 + ... + cd == sum, evaluation via Horner (coeff.rs:20-39)."""
    msgs, challenges = [], []
    for _ in range(num_vars):
        msgs.append(transcript.read_field_elements(degree + 1))
        challenges.append(transcript.squeeze_challenge())
    current = sum_ % p
    for rnd, (msg, r) in enumerate(zip(msgs, challenges)):
        if current != (2 * msg[0] + sum(msg[1:])) % p:
            raise SumcheckError(f"coeff consistency failure at round {rnd}")
        acc = 0
        for c in reversed(msg):
            acc = (acc * r + c) % p
        current = acc
    return current, challenges


# ---------------------------------------------------------------------------
# verifier (host)
# ---------------------------------------------------------------------------


def verify(
    p: int,
    num_vars: int,
    degree: int,
    sum_: int,
    transcript: Keccak256Transcript,
) -> Tuple[int, List[int]]:
    """Read round messages, check consistency, return (final_eval, challenges)
    (classic.rs:242-263 + RoundMessage::verify_consistency semantics)."""
    points = list(range(degree + 1))
    weights = barycentric_weights(p, points)
    msgs = []
    challenges = []
    for _ in range(num_vars):
        msgs.append(transcript.read_field_elements(degree + 1))
        challenges.append(transcript.squeeze_challenge())

    current = sum_ % p
    for rnd, (msg, r) in enumerate(zip(msgs, challenges)):
        if current != (msg[0] + msg[1]) % p:
            raise SumcheckError(f"consistency failure at round {rnd}")
        current = barycentric_interpolate(p, weights, points, msg, r)
    return current, challenges
