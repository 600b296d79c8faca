"""Pallas TPU kernels for packed-limb field arithmetic.

Layout: limbs-FIRST uint32[L, N] — limb index in sublanes, batch in lanes —
so each per-limb row is a full (N,) lane vector and the unrolled schoolbook
/ reduction pipeline runs entirely in VMEM with no relayouts. This is the
hand-scheduled counterpart of ops/field.py's jnp path (which XLA fuses but
keeps in batch-major layout); bench_pallas.py compares both on hardware.

Kernels:
  * mont_mul:   c = a*b*R^{-1} mod p
  * fix_var:    out = (odd - even)*x + even  (the sumcheck fold, fused)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_lasso_tpu.ops.field import LIMB_BITS, LIMB_MASK, FieldSpec

TILE = 1024  # lanes per grid step


def _mont_mul_body(spec: FieldSpec, a, b):
    """a, b: (L, T) u32 -> (L, T). Fully unrolled; all values stay in VMEM."""
    L = spec.num_limbs
    p_limbs = [int(v) for v in spec.p_limbs]
    npr = jnp.uint32(getattr(spec, "npr16"))

    ai = [a[i] for i in range(L)]
    bi = [b[i] for i in range(L)]

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
    out = [jnp.where(use_d, d[k], r[k]) for k in range(L)]
    return jnp.stack(out, axis=0)


def make_mont_mul(spec: FieldSpec):
    """Returns jitted f(a (L, N), b (L, N)) -> (L, N)."""
    L = spec.num_limbs

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = _mont_mul_body(spec, a_ref[:], b_ref[:])

    @jax.jit
    def mont_mul_lf(a, b):
        n = a.shape[1]
        assert n % TILE == 0
        grid = (n // TILE,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        )(a, b)

    return mont_mul_lf


def make_fix_var(spec: FieldSpec):
    """Returns jitted f(evals (L, N), x (L, 1)) -> (L, N/2):
    out = (odd - even) * x + even, fused in one VMEM pass."""
    L = spec.num_limbs
    p_limbs = [int(v) for v in spec.p_limbs]

    def kernel(even_ref, odd_ref, x_ref, o_ref):
        # even/odd pre-split OUTSIDE the kernel: lane-strided slicing does
        # not lower in Mosaic (gather); XLA handles the de-interleave.
        even_full = even_ref[:]  # (L, T)
        odd_full = odd_ref[:]
        x = x_ref[:]  # (L, 1)
        even = [even_full[i] for i in range(L)]
        odd = [odd_full[i] for i in range(L)]
        # sub mod p
        diff = []
        borrow = jnp.zeros_like(even[0])
        for k in range(L):
            v = odd[k] - even[k] - borrow
            diff.append(v & LIMB_MASK)
            borrow = (v >> LIMB_BITS) & 1
        underflow = borrow == 1
        carry = jnp.zeros_like(even[0])
        for k in range(L):
            v = diff[k] + jnp.where(underflow, jnp.uint32(p_limbs[k]), 0) + carry
            diff[k] = v & LIMB_MASK
            carry = v >> LIMB_BITS
        d = jnp.stack(diff, axis=0)
        xb = jnp.broadcast_to(x, d.shape)
        prod = _mont_mul_body(spec, d, xb)
        # add even mod p
        out = []
        carry = jnp.zeros_like(even[0])
        for k in range(L):
            v = prod[k] + even[k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        borrow = jnp.zeros_like(even[0])
        d2 = []
        for k in range(L):
            v = out[k] - jnp.uint32(p_limbs[k]) - borrow
            d2.append(v & LIMB_MASK)
            borrow = (v >> LIMB_BITS) & 1
        use_d = borrow == 0
        o_ref[:] = jnp.stack(
            [jnp.where(use_d, d2[k], out[k]) for k in range(L)], axis=0
        )

    @jax.jit
    def fix_var_lf(evals, x):
        n = evals.shape[1]
        assert n % (2 * TILE) == 0
        even = evals[:, 0::2]
        odd = evals[:, 1::2]
        grid = (n // (2 * TILE),)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, n // 2), jnp.uint32),
        )(even, odd, x)

    return fix_var_lf


def to_limbs_first(arr: jnp.ndarray) -> jnp.ndarray:
    """(N, L) -> (L, N)."""
    return jnp.transpose(arr, (1, 0))


def from_limbs_first(arr: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(arr, (1, 0))


def make_fold_all(spec: FieldSpec, keys):
    """One kernel folding EVERY table of the sumcheck state with the same
    challenge: f(tables dict (L, N), x (L, 1)) -> dict (L, N/2)."""
    L = spec.num_limbs
    keys = list(keys)
    nin = len(keys)

    def kernel(*refs):
        even_refs = refs[:nin]
        odd_refs = refs[nin : 2 * nin]
        x_ref = refs[2 * nin]
        out_refs = refs[2 * nin + 1 :]
        x = x_ref[:]
        like = even_refs[0][:][0]
        xrows = [jnp.broadcast_to(x[i], like.shape) for i in range(L)]
        for eref, oref, fref in zip(even_refs, odd_refs, out_refs):
            e = eref[:]
            o = oref[:]
            evens = [e[i] for i in range(L)]
            odds = [o[i] for i in range(L)]
            diff = _sub_rows(spec, odds, evens)
            prod = _mul_rows(spec, diff, xrows)
            folded = _add_rows(spec, prod, evens)
            fref[:] = jnp.stack(folded, axis=0)

    @jax.jit
    def fold_fn(tables: dict, x):
        n = tables[keys[0]].shape[1]
        assert n % (2 * TILE) == 0
        nblocks = n // (2 * TILE)
        evens = [tables[k][:, 0::2] for k in keys]
        odds = [tables[k][:, 1::2] for k in keys]
        in_specs = [
            pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * (2 * nin) + [
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ]
        out_specs = [
            pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * nin
        out_shape = [jax.ShapeDtypeStruct((L, n // 2), jnp.uint32)] * nin
        outs = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )(*evens, *odds, x)
        return {k: v for k, v in zip(keys, outs)}

    return fold_fn


# ---------------------------------------------------------------------------
# fused sumcheck round kernel
# ---------------------------------------------------------------------------


def _add_rows(spec, a, b):
    """row-lists mod-p add: a, b lists of (T,) u32."""
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


def _mul_rows(spec, a, b):
    out = _mont_mul_body(spec, jnp.stack(a, axis=0), jnp.stack(b, axis=0))
    return [out[i] for i in range(spec.num_limbs)]


def _neg_rows(spec, a):
    zero = [jnp.zeros_like(a[0]) for _ in range(spec.num_limbs)]
    return _sub_rows(spec, zero, a)


def make_sumcheck_round(
    spec: FieldSpec,
    expression,
    poly_keys,
    degree: int,
    num_challenges: int = 0,
    include_fold: bool = True,
):
    """Fused EvaluationsProver round: for each grid block, evaluate the
    traced expression at t = 1..degree over the block's half-pairs,
    accumulate per-block partial sums (16-bit-split), and emit the folded
    tables — one VMEM-resident pass over every leaf table.

    Returns jitted f(tables: dict key -> (L, N), challenge (L, 1),
                     challenges (num_challenges, L) or None) ->
      ((degree, L) round message in Montgomery form, folded tables dict).

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
        even_refs = refs[:nin]
        odd_refs = refs[nin : 2 * nin]
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

        evens = {}
        odds = {}
        for key, eref, oref in zip(keys, even_refs, odd_refs):
            e = eref[:]
            o = oref[:]
            evens[key] = [e[i] for i in range(L)]
            odds[key] = [o[i] for i in range(L)]

        like = evens[keys[0]][0]

        if include_fold:
            # fold: out = (odd - even) * x + even
            x = x_ref[:]
            xrows = [jnp.broadcast_to(x[i], like.shape) for i in range(L)]
            for key, fref in zip(keys, fold_refs):
                diff = _sub_rows(spec, odds[key], evens[key])
                prod = _mul_rows(spec, diff, xrows)
                folded = _add_rows(spec, prod, evens[key])
                fref[:] = jnp.stack(folded, axis=0)

        # message: values at t start at odd (t=1), step = odd - even
        steps = {k: _sub_rows(spec, odds[k], evens[k]) for k in keys}
        values = {k: odds[k] for k in keys}
        partial_rows = []

        chal_rows = None
        if num_challenges:
            c = chal_ref[:]  # (num_challenges * L, 1)
            chal_rows = [
                [
                    jnp.broadcast_to(c[j * L + i], like.shape)
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
            # per-limb lane sums < 2^16 * TILE = 2^26; SPLIT into 16-bit
            # halves so the caller's cross-block sum stays in u32
            cols = []
            for i in range(L):
                # Mosaic lacks unsigned reductions; values < 2^16 so an
                # int32 sum over TILE lanes stays < 2^26 and is exact.
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
        n = tables[keys[0]].shape[1]
        assert n % (2 * TILE) == 0
        nblocks = n // (2 * TILE)
        evens = [tables[k][:, 0::2] for k in keys]
        odds = [tables[k][:, 1::2] for k in keys]
        in_specs = [
            pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * (2 * nin)
        extra_in = []
        if include_fold:
            in_specs.append(
                pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            extra_in.append(challenge)
        if num_challenges:
            in_specs.append(
                pl.BlockSpec(
                    (num_challenges * L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
                )
            )
            extra_in.append(challenges.reshape(num_challenges * L, 1))
        out_specs = [
            pl.BlockSpec(
                (8, degree * 2 * L), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        out_shape = [
            jax.ShapeDtypeStruct((8 * nblocks, degree * 2 * L), jnp.uint32)
        ]
        if include_fold:
            out_specs += [
                pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * nin
            out_shape += [jax.ShapeDtypeStruct((L, n // 2), jnp.uint32)] * nin
        outs = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )(*evens, *odds, *extra_in)
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
