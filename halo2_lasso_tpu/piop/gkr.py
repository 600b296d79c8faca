"""GKR for batched fractional sumchecks ([PH23] §3), TPU-native.

Protocol mirrors /root/reference/plonkish_backend/src/piop/gkr/
fractional_sum_check.rs: prove/verify claims sum_b p_i(b)/q_i(b) via a
layered circuit p' = p_l*q_r + p_r*q_l, q' = q_l*q_r (split on the HIGHEST
variable), one batched degree-3 sumcheck per layer descending, and a mu-fold
to push the claim one layer down. A pure grand product is the q-side with
p = 0 — this is the memory-checking engine used by Lasso.

Layer construction is fully vectorized on device; the per-layer sumcheck is
the shared EvaluationsProver kernel.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.expression import Expression, Query
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.piop import sum_check
from halo2_lasso_tpu.transcript import Keccak256Transcript


from halo2_lasso_tpu.errors import Halo2LassoError


class GkrError(Halo2LassoError):
    pass


_expr_cache: Dict[Tuple[int, bool], Expression] = {}


def sum_check_expression(num_batching: int) -> Expression:
    """distribute_powers([p_l q_r + p_r q_l, q_l q_r]_i, gamma) * eq
    (fractional_sum_check.rs:272-283)."""
    key = (num_batching, False)
    if key in _expr_cache:
        return _expr_cache[key]
    exprs = []
    for i in range(num_batching):
        p_l = Expression.poly(4 * i)
        p_r = Expression.poly(4 * i + 1)
        q_l = Expression.poly(4 * i + 2)
        q_r = Expression.poly(4 * i + 3)
        exprs.append(p_l * q_r + p_r * q_l)
        exprs.append(q_l * q_r)
    e = Expression.distribute_powers(exprs, Expression.challenge(0)) * Expression.eq_xy(0)
    _expr_cache[key] = e
    return e


def sum_check_expression_pure(num_batching: int) -> Expression:
    """PURE-GRAND-PRODUCT round expression: every p is identically zero
    (memory-check usage), so the p-side terms of the batched message are
    structurally 0 and only q_l*q_r survives. The const-0 placeholders keep
    the gamma-power alignment of the full expression, so round messages —
    and therefore proof bytes — are identical to running the full circuit
    on zero ps, at a third of the multiplications."""
    key = (num_batching, True)
    if key in _expr_cache:
        return _expr_cache[key]
    exprs = []
    for i in range(num_batching):
        exprs.append(Expression.constant(0))  # p-slot: gamma^{2i}
        exprs.append(Expression.poly(2 * i) * Expression.poly(2 * i + 1))
    e = Expression.distribute_powers(exprs, Expression.challenge(0)) * Expression.eq_xy(0)
    _expr_cache[key] = e
    return e


def _sum_check_claim(p_ys: Sequence[int], q_ys: Sequence[int], gamma: int, p: int) -> int:
    acc = 0
    power = 1
    for pv, qv in zip(p_ys, q_ys):
        acc = (acc + power * pv) % p
        power = power * gamma % p
        acc = (acc + power * qv) % p
        power = power * gamma % p
    return acc


def _layer_down_claim(evals: Sequence[int], mu: int, p: int) -> Tuple[List[int], List[int]]:
    p_xs, q_xs = [], []
    for i in range(0, len(evals), 4):
        p_l, p_r, q_l, q_r = evals[i : i + 4]
        p_xs.append((p_l + mu * (p_r - p_l)) % p)
        q_xs.append((q_l + mu * (q_r - q_l)) % p)
    return p_xs, q_xs


@jax.jit
def _layer_products(pl, pr, ql, qr):
    """p' = p_l*q_r + p_r*q_l, q' = q_l*q_r over (b, m, L) stacks."""
    spec = Fr
    p_new = F.add(spec, F.mont_mul(spec, pl, qr), F.mont_mul(spec, pr, ql))
    q_new = F.mont_mul(spec, ql, qr)
    return p_new, q_new


# b*m elements above this run the layer in column slices: the jnp mont_mul
# materializes a (b*m, L, 2L) schoolbook intermediate (2K bytes per
# element, x3 live products per layer step)
_LAYER_SLICE_ELEMS = 1 << 19


def _layer_up_stacked(pl, pr, ql, qr):
    """STACKED (b, m, L) layer step: one vectorized mul per product over the
    whole batch (the earlier per-pair unroll grew the module with b and ran
    replicated under a mesh). Fraction tree semantics:
    p' = p_l*q_r + p_r*q_l, q' = q_l*q_r, then split on the high variable
    (the split is GLOBAL over m — slices only chunk the elementwise
    products)."""
    b, m = pl.shape[0], pl.shape[1]
    if b * m <= _LAYER_SLICE_ELEMS:
        p_new, q_new = _layer_products(pl, pr, ql, qr)
    else:
        step = max(128, _LAYER_SLICE_ELEMS // b)
        parts = [
            _layer_products(
                pl[:, off : off + step],
                pr[:, off : off + step],
                ql[:, off : off + step],
                qr[:, off : off + step],
            )
            for off in range(0, m, step)
        ]
        p_new = jnp.concatenate([pt[0] for pt in parts], axis=1)
        q_new = jnp.concatenate([pt[1] for pt in parts], axis=1)
    mid = m // 2
    return (
        p_new[:, :mid],
        p_new[:, mid:],
        q_new[:, :mid],
        q_new[:, mid:],
    )


@jax.jit
def _layer_products_q(ql, qr):
    return F.mont_mul(Fr, ql, qr)


def _layer_up_stacked_q(ql, qr):
    """Pure-product layer step: q' = q_l*q_r only (see _layer_up_stacked)."""
    b, m = ql.shape[0], ql.shape[1]
    if b * m <= _LAYER_SLICE_ELEMS:
        q_new = _layer_products_q(ql, qr)
    else:
        step = max(128, _LAYER_SLICE_ELEMS // b)
        q_new = jnp.concatenate(
            [
                _layer_products_q(ql[:, off : off + step], qr[:, off : off + step])
                for off in range(0, m, step)
            ],
            axis=1,
        )
    mid = m // 2
    return q_new[:, :mid], q_new[:, mid:]


def _place_sharded(a: jnp.ndarray) -> jnp.ndarray:
    """Shard a stacked (b, m, L) layer over the active mesh's data axis
    (axis 1); XLA GSPMD inserts the halving collectives at the splits."""
    from halo2_lasso_tpu.parallel import sharding as shd

    mesh = shd.active_mesh()
    if mesh is not None and a.shape[1] >= 2 * mesh.size:
        return shd.shard_evals_axis1(mesh, a)
    return a


def prove_fractional_sum_check(
    claimed_p_0s: Sequence[Optional[int]],
    claimed_q_0s: Sequence[Optional[int]],
    ps: Sequence[jnp.ndarray],
    qs: Sequence[jnp.ndarray],
    transcript: Keccak256Transcript,
) -> Tuple[List[int], List[int], List[int]]:
    """fractional_sum_check.rs:89-190. ps/qs: device (2^n, L) arrays.
    Returns (p evals at x, q evals at x, x).

    PURE-PRODUCT mode: a caller whose numerators are identically zero (the
    Lasso memory check's grand products) passes `None` for every entry of
    `ps`. The prover then skips every p-side multiplication — layer build
    and round messages — while emitting byte-identical transcripts (zero
    terms contribute nothing to any message; the p evals written per layer
    are literal zeros)."""
    spec = Fr
    p = spec.modulus
    num_batching = len(ps)
    assert num_batching and len(qs) == num_batching == len(claimed_p_0s) == len(claimed_q_0s)
    pure = all(x is None for x in ps)
    assert pure or all(x is not None for x in ps), "mixed zero/nonzero ps unsupported"
    num_vars = qs[0].shape[0].bit_length() - 1

    # bottom layer: stack the batch, split on the highest variable; build
    # upward with ONE vectorized module per level, sharded over the active
    # mesh's data axis when large enough. Layers at/below the host-tail
    # threshold are pulled ONCE and built with the C field kernels — their
    # per-layer sumchecks then run with zero device round-trips (the Lasso
    # prover's former latency floor: ~16 tunnel-RTT-bound layer sumchecks
    # per grand-product batch at nv=16).
    from halo2_lasso_tpu.ops import host_field
    from halo2_lasso_tpu.parallel import sharding as shd

    host_m = 0
    if host_field.available(spec):
        host_m = sum_check.host_tail_size((2 if pure else 4) * num_batching)
        mesh = shd.active_mesh()
        if mesh is not None:
            # keep layers large enough to shard on device so the collective
            # path stays exercised; only replicated-tail layers go host
            host_m = min(host_m, 2 * mesh.size - 1)

    nq = 2 if pure else 4  # quadrants per batch element in the flat views

    from halo2_lasso_tpu.config import sanity_enabled

    if pure:
        # HBM discipline (the k=20 memory check OOMed 15.75G here): build
        # the bottom quadrant stacks DIRECTLY and consume the caller's
        # input list as we go — a full-size jnp.stack(qs) plus half-slices
        # would carry 3 copies of b*2^n elements (12GB at b=16, n=20).
        # Mutating `qs` releases the fingerprint arrays the caller no
        # longer needs (memory-check callers pass a dedicated list); under
        # sanity the originals are kept for the final-claim check.
        qs = list(qs) if sanity_enabled() else qs
        ql_list, qr_list = [], []
        consume = isinstance(qs, list) and not sanity_enabled()
        for i in range(num_batching):
            q = qs[i]
            m2 = q.shape[0] // 2
            ql_list.append(q[:m2])
            qr_list.append(q[m2:])
            if consume:
                qs[i] = None
            del q
        ql_st = _place_sharded(jnp.stack(ql_list))
        ql_list = None
        qr_st = _place_sharded(jnp.stack(qr_list))
        qr_list = None
        stacked = (ql_st, qr_st)
        del ql_st, qr_st
    else:
        qs_st = _place_sharded(jnp.stack(qs))
        mid = qs_st.shape[1] // 2
        ps_st = _place_sharded(jnp.stack(ps))  # (b, 2^n, L)
        stacked = (
            ps_st[:, :mid],
            ps_st[:, mid:],
            qs_st[:, :mid],
            qs_st[:, mid:],
        )
    # layers hold STACKED quadrant tuples; the per-batch flat views the
    # sumcheck consumes are materialized lazily in the descent loop and
    # freed right after (each materialization is a device copy — keeping
    # every layer's flat views alive doubled HBM at k=20)
    layers_st = [stacked]
    del stacked
    while layers_st[-1][0].shape[1] > max(1, host_m):
        nxt_st = (
            _layer_up_stacked_q(*layers_st[-1])
            if pure
            else _layer_up_stacked(*layers_st[-1])
        )
        layers_st.append(nxt_st)

    layers: List = list(layers_st)

    if host_m:
        from halo2_lasso_tpu.ops.host_field import HVec

        hctx = host_field.ctx_for(spec)
        # one pull of the first host-sized layer, then pure host building
        last = layers_st.pop()
        layers.pop()
        raw = np.asarray(jnp.stack(last))  # (nq, b, m, L)
        del last
        packed = hctx.pack_u32(raw)
        cur = [
            [HVec(hctx, packed[j][i]) for j in range(nq)]
            for i in range(num_batching)
        ]
        while True:
            layers.append(
                [cur[i][j] for i in range(num_batching) for j in range(nq)]
            )
            m = cur[0][0].n
            if m == 1:
                break
            nxt = []
            for i in range(num_batching):
                mid2 = m // 2
                if pure:
                    ql, qr = cur[i]
                    qn = ql * qr
                    nxt.append([qn[:mid2], qn[mid2:]])
                else:
                    pl, pr, ql, qr = cur[i]
                    pn, qn = hctx.gkr_layer(pl, pr, ql, qr)
                    nxt.append([pn[:mid2], pn[mid2:], qn[:mid2], qn[mid2:]])
            cur = nxt

    def _flat(entry):
        """Materialize a stacked tuple into the per-batch flat view the
        sumcheck consumes (host layers are stored flat already)."""
        if isinstance(entry, tuple):
            return [entry[j][i] for i in range(num_batching) for j in range(nq)]
        return entry

    del layers_st

    # top-layer claims
    top = _flat(layers[-1])
    p_0s, q_0s = [], []
    for i in range(num_batching):
        if host_m:
            vals = [top[nq * i + j].to_int(0) for j in range(nq)]
        else:
            vals = [F.decode_scalar(spec, top[nq * i + j][0]) for j in range(nq)]
        if pure:
            q_l, q_r = vals
            p_l = p_r = 0
        else:
            p_l, p_r, q_l, q_r = vals
        p_0s.append((p_l * q_r + p_r * q_l) % p)
        q_0s.append(q_l * q_r % p)
    for claimed, computed in ((claimed_p_0s, p_0s), (claimed_q_0s, q_0s)):
        for cl, co in zip(claimed, computed):
            if cl is not None:
                transcript.common_field_element(co)
            else:
                transcript.write_field_element(co)

    expression = (
        sum_check_expression_pure(num_batching)
        if pure
        else sum_check_expression(num_batching)
    )

    top_claims = (list(p_0s), list(q_0s))
    claimed_p_ys, claimed_q_ys = p_0s, q_0s
    y: List[int] = []
    for layer_idx in range(len(layers) - 1, -1, -1):
        from halo2_lasso_tpu.ops.host_field import HVec

        layer = _flat(layers[layer_idx])
        layers[layer_idx] = None  # free the stacked copy before the sumcheck
        is_host = isinstance(layer[0], HVec)
        nv = (len(layer[0]) if is_host else layer[0].shape[0]).bit_length() - 1
        if nv == 0:
            x = []
            evals = [
                arr.to_int(0) if is_host else F.decode_scalar(spec, arr[0])
                for arr in layer
            ]
        else:
            gamma = transcript.squeeze_challenge()
            claim = _sum_check_claim(claimed_p_ys, claimed_q_ys, gamma, p)
            vp = sum_check.VirtualPolynomial(expression, layer, [gamma], [y])
            del layer
            x, evals = sum_check.prove(spec, nv, vp, claim, transcript)
            del vp
        if pure:
            # interleave the structurally-zero p evals back into the wire
            # layout [p_l, p_r, q_l, q_r]*b — byte parity with full mode
            evals = [
                v
                for i in range(num_batching)
                for v in (0, 0, evals[2 * i], evals[2 * i + 1])
            ]
        transcript.write_field_elements(evals)
        mu = transcript.squeeze_challenge()
        claimed_p_ys, claimed_q_ys = _layer_down_claim(evals, mu, p)
        x.append(mu)
        y = x

    from halo2_lasso_tpu.config import sanity_enabled

    if sanity_enabled():  # fractional_sum_check.rs:184-187: final claims are
        # the input MLEs evaluated at the final point
        from halo2_lasso_tpu.poly import multilinear as mle

        y_dev = jnp.asarray(spec.encode(list(y)))
        pairs = [(qs, claimed_q_ys)] if pure else [(ps, claimed_p_ys), (qs, claimed_q_ys)]
        if pure:
            assert all(cl == 0 for cl in claimed_p_ys)
        for arrs, claims in pairs:
            for arr, cl in zip(arrs, claims):
                got = F.decode_scalar(spec, mle.evaluate(spec, arr, y_dev))
                assert got == cl, "gkr final claim does not match input MLE"

    return claimed_p_ys, claimed_q_ys, y, top_claims


def verify_fractional_sum_check(
    num_vars: int,
    claimed_p_0s: Sequence[Optional[int]],
    claimed_q_0s: Sequence[Optional[int]],
    transcript: Keccak256Transcript,
) -> Tuple[List[int], List[int], List[int]]:
    """fractional_sum_check.rs:193-270."""
    spec = Fr
    p = spec.modulus
    num_batching = len(claimed_p_0s)
    assert num_batching and len(claimed_q_0s) == num_batching

    p_0s, q_0s = [], []
    for claimed, out in ((claimed_p_0s, p_0s), (claimed_q_0s, q_0s)):
        for cl in claimed:
            if cl is not None:
                transcript.common_field_element(cl)
                out.append(cl % p)
            else:
                out.append(transcript.read_field_element())

    expression = sum_check_expression(num_batching)

    top_claims = (list(p_0s), list(q_0s))
    claimed_p_ys, claimed_q_ys = p_0s, q_0s
    y: List[int] = []
    for nv in range(num_vars):
        if nv == 0:
            evals = transcript.read_field_elements(4 * num_batching)
            for i, (cp, cq) in enumerate(zip(claimed_p_ys, claimed_q_ys)):
                p_l, p_r, q_l, q_r = evals[4 * i : 4 * i + 4]
                if cp != (p_l * q_r + p_r * q_l) % p or cq != q_l * q_r % p:
                    raise GkrError("unmatched sum_check output (top layer)")
            x = []
        else:
            gamma = transcript.squeeze_challenge()
            claim = _sum_check_claim(claimed_p_ys, claimed_q_ys, gamma, p)
            x_eval, x = sum_check.verify(p, nv, expression.degree, claim, transcript)
            evals = transcript.read_field_elements(4 * num_batching)
            eval_map = {Query(i, 0): v for i, v in enumerate(evals)}
            got = sum_check.evaluate_at_point(
                expression, p, nv, eval_map, [gamma], [y], x
            )
            if got != x_eval:
                raise GkrError("unmatched sum_check output")
        mu = transcript.squeeze_challenge()
        claimed_p_ys, claimed_q_ys = _layer_down_claim(evals, mu, p)
        x.append(mu)
        y = x

    return claimed_p_ys, claimed_q_ys, y, top_claims
