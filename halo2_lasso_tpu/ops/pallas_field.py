"""Pallas TPU kernels for packed-limb field arithmetic.

Layout (v2): limbs-first TILE-ALIGNED 3D — uint32[L, S, 128] with S = N/128.
Row-major, each limb's (S, 128) plane is S/8 native (8, 128) VREG tiles, so
slicing limb i out of a loaded block is layout-free (the round-1 (L, N) rows
forced Mosaic relayouts on every per-limb op; measured 2.4-6x slower).

Hypercube storage order (v2): BIT-REVERSED indices. The sumcheck folds the
lowest logical variable each round (reference semantics, classic.rs:90-141);
under bit-reversed storage the fold pairs (b0=0, b0=1) are the contiguous
(first half, second half) of the array — EVERY round, all the way down —
so no stride-2 de-interleave gather ever happens, and the folded output is
again bit-reversed storage for the remaining variables. One gather at entry
(to_lf), one at exit (from_lf); round messages are sums over the hypercube
and therefore order-independent, so proofs stay byte-identical.

Kernels:
  * make_sumcheck_round: fused EvaluationsProver round (message at t=1..d
    + fold of every leaf table, one VMEM-resident pass)
  * make_fold_all: fold-only kernel
  * make_mont_mul / make_fix_var: microbench / building-block kernels
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_lasso_tpu.ops.field import LIMB_BITS, LIMB_MASK, FieldSpec

import os as _os

# sublane-rows per grid step (8 -> 8*128 = 1024 lanes/block); overridable
# for on-chip tile-size sweeps
TILE_S = int(_os.environ.get("HALO2_LASSO_TPU_TILE_S", "8"))
LANE = 128


# ---------------------------------------------------------------------------
# layout transforms (XLA level, once per sumcheck)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _bitrev_indices(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _to_lf_fn(L: int, n: int):
    idx = jnp.asarray(_bitrev_indices(n.bit_length() - 1))

    @jax.jit
    def f(a):  # (n, L) -> (L, n//128, 128), bit-reversed storage
        return jnp.transpose(a[idx], (1, 0)).reshape(L, n // LANE, LANE)

    return f


@functools.lru_cache(maxsize=None)
def _from_lf_fn(L: int, n: int):
    idx = jnp.asarray(_bitrev_indices(n.bit_length() - 1))

    @jax.jit
    def f(t):  # (L, n//128, 128) -> (n, L), logical order
        return jnp.transpose(t.reshape(L, n), (1, 0))[idx]

    return f


def to_lf(arr: jnp.ndarray) -> jnp.ndarray:
    """(N, L) logical-order -> (L, N/128, 128) bit-reversed tile layout."""
    n, L = arr.shape
    return _to_lf_fn(L, n)(arr)


def from_lf(t: jnp.ndarray) -> jnp.ndarray:
    """(L, S, 128) bit-reversed tile layout -> (N, L) logical order."""
    L, S, _ = t.shape
    return _from_lf_fn(L, S * LANE)(t)


# ---------------------------------------------------------------------------
# in-kernel field helpers on lists of limb rows (any row shape)
# ---------------------------------------------------------------------------


def _mont_mul_body(spec: FieldSpec, a, b):
    """a, b: (L, ...) u32 stacked limb arrays -> (L, ...). Fully unrolled."""
    L = spec.num_limbs
    out = _mul_rows(spec, [a[i] for i in range(L)], [b[i] for i in range(L)])
    return jnp.stack(out, axis=0)


def _mul_rows(spec: FieldSpec, ai, bi):
    """Schoolbook + Montgomery reduction on lists of limb rows."""
    L = spec.num_limbs
    p_limbs = [int(v) for v in spec.p_limbs]
    npr = jnp.uint32(getattr(spec, "npr16"))

    # schoolbook columns with lazy carries: t[k] < 2^21
    t = [None] * (2 * L)
    for i in range(L):
        for j in range(L):
            prod = ai[i] * bi[j]
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            k = i + j
            t[k] = lo if t[k] is None else t[k] + lo
            t[k + 1] = hi if t[k + 1] is None else t[k + 1] + hi

    # montgomery reduction, limb by limb
    for i in range(L):
        carry = t[i] >> LIMB_BITS
        ti = t[i] & LIMB_MASK
        m = (ti * npr) & LIMB_MASK
        for j in range(L):
            if p_limbs[j] == 0:
                continue
            mp = m * jnp.uint32(p_limbs[j])
            lo = mp & LIMB_MASK
            hi = mp >> LIMB_BITS
            if j == 0:
                carry2 = (ti + lo) >> LIMB_BITS
                t[i + 1] = t[i + 1] + carry2
            else:
                t[i + j] = t[i + j] + lo
            t[i + j + 1] = t[i + j + 1] + hi
        t[i + 1] = t[i + 1] + carry

    # carry propagate the top half
    r = []
    carry = jnp.zeros_like(t[L])
    for k in range(L):
        v = t[L + k] + carry
        r.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS

    # conditional subtract p
    borrow = jnp.zeros_like(r[0])
    d = []
    for k in range(L):
        v = r[k] - jnp.uint32(p_limbs[k]) - borrow
        d.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    use_d = borrow == 0
    return [jnp.where(use_d, d[k], r[k]) for k in range(L)]


def _add_rows(spec, a, b):
    L = spec.num_limbs
    p_limbs = [int(v) for v in spec.p_limbs]
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(L):
        v = a[k] + b[k] + carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    borrow = jnp.zeros_like(a[0])
    d = []
    for k in range(L):
        v = out[k] - jnp.uint32(p_limbs[k]) - borrow
        d.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    keep = borrow == 0
    return [jnp.where(keep, d[k], out[k]) for k in range(L)]


def _sub_rows(spec, a, b):
    L = spec.num_limbs
    p_limbs = [int(v) for v in spec.p_limbs]
    out = []
    borrow = jnp.zeros_like(a[0])
    for k in range(L):
        v = a[k] - b[k] - borrow
        out.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    under = borrow == 1
    carry = jnp.zeros_like(a[0])
    res = []
    for k in range(L):
        v = out[k] + jnp.where(under, jnp.uint32(p_limbs[k]), 0) + carry
        res.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return res


def _neg_rows(spec, a):
    zero = [jnp.zeros_like(a[0]) for _ in range(spec.num_limbs)]
    return _sub_rows(spec, zero, a)


def _scalar_rows(x, L, shape):
    """In-kernel broadcast of a pre-lane-broadcast (L, LANE) scalar block to
    per-limb (tile, LANE) rows. Mosaic cannot broadcast (1, 1) -> (s, l) in
    one step ("broadcast in both sublanes and lanes"), so callers broadcast
    the lane axis OUTSIDE the kernel and only the sublane axis is expanded
    here."""
    return [
        jnp.broadcast_to(x[i].reshape(1, LANE), shape) for i in range(L)
    ]


def _lane_bcast(x):
    """(rows, 1) -> (rows, LANE) at the XLA level (outside the kernel)."""
    return jnp.broadcast_to(x, (x.shape[0], LANE))


# ---------------------------------------------------------------------------
# building-block kernels (microbench surface)
# ---------------------------------------------------------------------------


def make_mont_mul(spec: FieldSpec):
    """Returns jitted f(a (L, S, 128), b (L, S, 128)) -> (L, S, 128)."""
    L = spec.num_limbs

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = _mont_mul_body(spec, a_ref[:], b_ref[:])

    @jax.jit
    def mont_mul_lf(a, b):
        S = a.shape[1]
        tile = min(TILE_S, S)
        spec3 = lambda: pl.BlockSpec(
            (L, tile, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(S // tile,),
            in_specs=[spec3(), spec3()],
            out_specs=spec3(),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        )(a, b)

    return mont_mul_lf


def make_fix_var(spec: FieldSpec):
    """Returns jitted f(evals (L, S, 128) bit-rev storage, x (L, 1)) ->
    (L, S/2, 128): out = (hi - lo)*x + lo, the sumcheck fold."""
    L = spec.num_limbs

    def kernel(lo_ref, hi_ref, x_ref, o_ref):
        lo = lo_ref[:]
        hi = hi_ref[:]
        x = x_ref[:]
        like = lo[0]
        xrows = _scalar_rows(x, L, like.shape)
        los = [lo[i] for i in range(L)]
        his = [hi[i] for i in range(L)]
        diff = _sub_rows(spec, his, los)
        prod = _mul_rows(spec, diff, xrows)
        folded = _add_rows(spec, prod, los)
        o_ref[:] = jnp.stack(folded, axis=0)

    @jax.jit
    def fix_var_lf(evals, x):
        S = evals.shape[1]
        Sh = S // 2
        tile = min(TILE_S, Sh)
        lo = evals[:, :Sh, :]
        hi = evals[:, Sh:, :]
        spec3 = lambda: pl.BlockSpec(
            (L, tile, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(Sh // tile,),
            in_specs=[
                spec3(),
                spec3(),
                pl.BlockSpec((L, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=spec3(),
            out_shape=jax.ShapeDtypeStruct((L, Sh, LANE), jnp.uint32),
        )(lo, hi, _lane_bcast(x))

    return fix_var_lf


def make_fold_all(spec: FieldSpec, keys):
    """One kernel folding EVERY table of the sumcheck state with the same
    challenge: f(tables dict (L, S, 128) bit-rev, x (L, 1)) -> dict
    (L, S/2, 128)."""
    L = spec.num_limbs
    keys = list(keys)
    nin = len(keys)

    # scoped-VMEM budget: each table needs lo+hi+out tiles, double-buffered.
    # 48-table states (ARX: 8 advice x rotations + selectors + eq) blew the
    # 16MB scoped-vmem limit in ONE call (measured 18MB); chunk the table
    # set so each pallas_call stays well under it.
    def _max_tables_per_call(tile: int) -> int:
        tile_bytes = L * tile * LANE * 4
        budget = 12 << 20
        return max(1, budget // (3 * 2 * tile_bytes))

    def _make_call(group_n: int, tile: int, Sh: int):
        gkernel = _group_kernel(group_n)
        spec3 = pl.BlockSpec(
            (L, tile, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        in_specs = [spec3] * (2 * group_n) + [
            pl.BlockSpec((L, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ]
        return gkernel, spec3, in_specs

    def _group_kernel(group_n: int):
        def kern(*refs):
            lo_refs = refs[:group_n]
            hi_refs = refs[group_n : 2 * group_n]
            x_ref = refs[2 * group_n]
            out_refs = refs[2 * group_n + 1 :]
            x = x_ref[:]
            like = lo_refs[0][:][0]
            xrows = _scalar_rows(x, L, like.shape)
            for lref, href, fref in zip(lo_refs, hi_refs, out_refs):
                lo = lref[:]
                hi = href[:]
                los = [lo[i] for i in range(L)]
                his = [hi[i] for i in range(L)]
                diff = _sub_rows(spec, his, los)
                prod = _mul_rows(spec, diff, xrows)
                folded = _add_rows(spec, prod, los)
                fref[:] = jnp.stack(folded, axis=0)

        return kern

    @jax.jit
    def fold_fn(tables: dict, x):
        S = tables[keys[0]].shape[1]
        Sh = S // 2
        tile = min(TILE_S, Sh)
        xb = _lane_bcast(x)
        out = {}
        maxg = _max_tables_per_call(tile)
        for off in range(0, nin, maxg):
            gkeys = keys[off : off + maxg]
            gn = len(gkeys)
            gkernel, spec3, in_specs = _make_call(gn, tile, Sh)
            los = [tables[k][:, :Sh, :] for k in gkeys]
            his = [tables[k][:, Sh:, :] for k in gkeys]
            outs = pl.pallas_call(
                gkernel,
                grid=(Sh // tile,),
                in_specs=in_specs,
                out_specs=[spec3] * gn,
                out_shape=[jax.ShapeDtypeStruct((L, Sh, LANE), jnp.uint32)] * gn,
            )(*los, *his, xb)
            if gn == 1:
                outs = [outs] if not isinstance(outs, (list, tuple)) else outs
            for k, v in zip(gkeys, outs):
                out[k] = v
        return out

    return fold_fn


# ---------------------------------------------------------------------------
# fused sumcheck round kernel
# ---------------------------------------------------------------------------


def make_sumcheck_round(
    spec: FieldSpec,
    expression,
    poly_keys,
    degree: int,
    num_challenges: int = 0,
    include_fold: bool = True,
):
    """Fused EvaluationsProver round: for each grid block, evaluate the
    traced expression at t = 1..degree over the block's (lo, hi) half-pairs,
    accumulate per-block partial sums (16-bit-split), and emit the folded
    tables — one VMEM-resident pass over every leaf table.

    Returns jitted f(tables: dict key -> (L, S, 128) bit-reversed storage,
                     challenge (L, 1) or None,
                     challenges (num_challenges, L) or None) ->
      ((degree, L) round message in Montgomery form,
       folded tables dict (L, S/2, 128) or None).

    Expression challenge leaves are runtime inputs, so the kernel compiles
    ONCE per (expression shape, size) — not per proof.
    """
    from halo2_lasso_tpu.expression import Expression  # noqa

    L = spec.num_limbs
    keys = list(poly_keys)
    nin = len(keys)

    def const_rows(v, like):
        from halo2_lasso_tpu.ops.field import int_to_limbs

        mont = int_to_limbs(spec.to_mont_int(v % spec.modulus), L)
        return [
            jnp.full_like(like, jnp.uint32(int(mont[k]))) for k in range(L)
        ]

    def kernel(*refs):
        lo_refs = refs[:nin]
        hi_refs = refs[nin : 2 * nin]
        pos = 2 * nin
        x_ref = None
        if include_fold:
            x_ref = refs[pos]
            pos += 1
        chal_ref = None
        if num_challenges:
            chal_ref = refs[pos]
            pos += 1
        out_partial_ref = refs[pos]
        fold_refs = refs[pos + 1 :]

        los = {}
        his = {}
        for key, lref, href in zip(keys, lo_refs, hi_refs):
            lo = lref[:]
            hi = href[:]
            los[key] = [lo[i] for i in range(L)]
            his[key] = [hi[i] for i in range(L)]

        like = los[keys[0]][0]

        if include_fold:
            # fold: out = (hi - lo) * x + lo
            x = x_ref[:]
            xrows = _scalar_rows(x, L, like.shape)
            for key, fref in zip(keys, fold_refs):
                diff = _sub_rows(spec, his[key], los[key])
                prod = _mul_rows(spec, diff, xrows)
                folded = _add_rows(spec, prod, los[key])
                fref[:] = jnp.stack(folded, axis=0)

        # message: values at t start at hi (t=1), step = hi - lo
        steps = {k: _sub_rows(spec, his[k], los[k]) for k in keys}
        values = {k: his[k] for k in keys}
        partial_rows = []

        chal_rows = None
        if num_challenges:
            c = chal_ref[:]  # (num_challenges * L, LANE), pre-lane-broadcast
            chal_rows = [
                [
                    jnp.broadcast_to(c[j * L + i].reshape(1, LANE), like.shape)
                    for i in range(L)
                ]
                for j in range(num_challenges)
            ]

        def eval_expr(vals):
            def go(e):
                k = e.kind
                if k == "const":
                    return const_rows(e.args[0], like)
                if k == "challenge":
                    return chal_rows[e.args[0]]
                if k == "poly":
                    q = e.args[0]
                    return vals[("poly", q.poly, q.rotation)]
                if k == "eq_xy":
                    return vals[("eq", e.args[0])]
                if k == "identity":
                    return vals[("identity",)]
                if k == "lagrange":
                    return vals[("lagrange", e.args[0])]
                if k == "neg":
                    return _neg_rows(spec, go(e.args[0]))
                if k == "sum":
                    return _add_rows(spec, go(e.args[0]), go(e.args[1]))
                if k == "product":
                    return _mul_rows(spec, go(e.args[0]), go(e.args[1]))
                if k == "scaled":
                    return _mul_rows(spec, go(e.args[0]), const_rows(e.args[1], like))
                if k == "powers":
                    exprs, base = e.args
                    b = go(base)
                    acc = go(exprs[0])
                    power = b
                    for i, ex in enumerate(exprs[1:]):
                        if i > 0:
                            power = _mul_rows(spec, power, b)
                        acc = _add_rows(spec, acc, _mul_rows(spec, power, go(ex)))
                    return acc
                raise ValueError(k)

            return go(expression)

        for t in range(1, degree + 1):
            if t > 1:
                values = {k: _add_rows(spec, values[k], steps[k]) for k in keys}
            term = eval_expr(values)
            # per-limb lane sums < 2^16 * TILE_S*128 = 2^26; SPLIT into
            # 16-bit halves so the caller's cross-block sum stays in u32
            cols = []
            for i in range(L):
                # Mosaic lacks unsigned reductions; values < 2^16 so an
                # int32 sum over the block lanes stays < 2^26 and is exact.
                s = jnp.sum(term[i].astype(jnp.int32)).astype(jnp.uint32)
                cols.append(s & LIMB_MASK)
                cols.append(s >> LIMB_BITS)
            partial_rows.append(jnp.stack(cols))

        # one (8, degree*2L) block per grid step: row 0 = partials, rest 0
        flat = jnp.concatenate(partial_rows)  # (degree*2L,)
        out_partial_ref[:] = jnp.concatenate(
            [flat[None, :], jnp.zeros((7, flat.shape[0]), jnp.uint32)], axis=0
        )

    @jax.jit
    def round_fn(tables: dict, challenge=None, challenges=None):
        S = tables[keys[0]].shape[1]
        Sh = S // 2
        tile = min(TILE_S, Sh)
        nblocks = Sh // tile
        los = [tables[k][:, :Sh, :] for k in keys]
        his = [tables[k][:, Sh:, :] for k in keys]
        spec3 = pl.BlockSpec(
            (L, tile, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        in_specs = [spec3] * (2 * nin)
        extra_in = []
        if include_fold:
            in_specs.append(
                pl.BlockSpec((L, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            extra_in.append(_lane_bcast(challenge))
        if num_challenges:
            in_specs.append(
                pl.BlockSpec(
                    (num_challenges * L, LANE),
                    lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            extra_in.append(_lane_bcast(challenges.reshape(num_challenges * L, 1)))
        out_specs = [
            pl.BlockSpec(
                (8, degree * 2 * L), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        out_shape = [
            jax.ShapeDtypeStruct((8 * nblocks, degree * 2 * L), jnp.uint32)
        ]
        if include_fold:
            out_specs += [spec3] * nin
            out_shape += [jax.ShapeDtypeStruct((L, Sh, LANE), jnp.uint32)] * nin
        outs = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )(*los, *his, *extra_in)
        # finish: sum the 16-bit split partials over blocks (u32-safe for
        # nblocks <= 2^16), recombine halves into lazy limbs, mod-reduce.
        split = jnp.sum(outs[0], axis=0, dtype=jnp.uint32).reshape(degree, L, 2)
        lo = split[:, :, 0]
        hi = split[:, :, 1]
        lazy = jnp.concatenate(
            [lo, jnp.zeros((degree, 1), jnp.uint32)], axis=1
        ) + jnp.concatenate([jnp.zeros((degree, 1), jnp.uint32), hi], axis=1)
        from halo2_lasso_tpu.ops import field as FF

        t = jnp.pad(lazy[:, :L], [(0, 0), (0, L)])
        t = t.at[:, L].add(lazy[:, L])
        msgs = FF.mont_mul(spec, FF._mont_reduce(spec, t), jnp.asarray(spec.r2))
        folded = {k: v for k, v in zip(keys, outs[1:])} if include_fold else None
        return msgs, folded

    return round_fn
