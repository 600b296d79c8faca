"""Pallas TPU kernels for BN254 G1 arithmetic + the MSM hot path.

Layout: limbs-first — a point batch is a dict {"x","y","z"} of uint32[L, N]
Montgomery-limb arrays (identity: z = 0), the same convention as
ops/pallas_field.py. One fused kernel performs a full branchless Jacobian
add (add-2007-bl with fused doubling / identity handling, the same math as
ops/ec.py::ec_add) over a lane tile, so each scan level of the MSM is a
single VMEM-resident pass instead of ~16 separate field-mul kernels.

MSM structure (semantics of /root/reference/plonkish_backend/src/util/
arithmetic/msm.rs:84-181, redesigned for the TPU):
  sort by 16-bit digit (XLA) -> inclusive prefix scan of EC adds
  (recursive even/odd halving, pallas combiner down to a cutoff) ->
  boundary rows scattered into the bucket table -> select-fill scan
  (no field math) -> one more EC scan over buckets -> window Horner.

This module is TPU-only: callers gate on the platform (ops/ec.py keeps the
portable jnp path used by the CPU test suite; bench.py asserts both paths
produce identical results on hardware).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_lasso_tpu.ops import ec as jec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.ops.field import LIMB_BITS, LIMB_MASK
from halo2_lasso_tpu.ops.pallas_field import _mont_mul_body

TILE = 512  # lanes per grid step (3 coords x 2 operands x 16 limbs x 4B x TILE fits VMEM)
PALLAS_MIN = 256  # below this many lanes the jnp combiner is used

L = Fq.num_limbs
_P_LIMBS = [int(v) for v in Fq.p_limbs]
_R_LIMBS = [int(v) for v in Fq.r_limbs]


# ---------------------------------------------------------------------------
# in-kernel field helpers on (L, T) arrays
# ---------------------------------------------------------------------------


def _addm(a, b):
    """mod-p add of (L, T) row arrays."""
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(L):
        v = a[k] + b[k] + carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    borrow = jnp.zeros_like(a[0])
    d = []
    for k in range(L):
        v = out[k] - jnp.uint32(_P_LIMBS[k]) - borrow
        d.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    keep = borrow == 0
    return jnp.stack([jnp.where(keep, d[k], out[k]) for k in range(L)])


def _subm(a, b):
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
        v = out[k] + jnp.where(under, jnp.uint32(_P_LIMBS[k]), 0) + carry
        res.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(res)


def _mulm(a, b):
    return _mont_mul_body(Fq, a, b)


def _is_zero_lanes(a):
    """(L, T) -> (T,) bool, per-lane all-limbs-zero."""
    s = jnp.sum(a.astype(jnp.int32), axis=0)  # limbs < 2^16, L terms: exact
    return s == 0


def _sel(mask, a, b):
    """per-lane select: mask (T,), a/b (L, T)."""
    return jnp.where(mask[None, :], a, b)


def _ec_add_body(x1, y1, z1, x2, y2, z2):
    """Full branchless Jacobian add (+fused double) on (L, T) coords."""
    z1z1 = _mulm(z1, z1)
    z2z2 = _mulm(z2, z2)
    u1 = _mulm(x1, z2z2)
    u2 = _mulm(x2, z1z1)
    s1 = _mulm(_mulm(y1, z2), z2z2)
    s2 = _mulm(_mulm(y2, z1), z1z1)
    h = _subm(u2, u1)
    rr_ = _subm(s2, s1)

    hh = _mulm(h, h)
    hhh = _mulm(hh, h)
    v = _mulm(u1, hh)
    rr2 = _mulm(rr_, rr_)
    x3 = _subm(_subm(rr2, hhh), _addm(v, v))
    y3 = _subm(_mulm(rr_, _subm(v, x3)), _mulm(s1, hhh))
    z3 = _mulm(_mulm(z1, z2), h)

    # fused doubling of (x1, y1, z1) for the p == q lanes (dbl-2009-l, a=0)
    a_ = _mulm(x1, x1)
    b_ = _mulm(y1, y1)
    c_ = _mulm(b_, b_)
    t_ = _mulm(_addm(x1, b_), _addm(x1, b_))
    t_ = _subm(_subm(t_, a_), c_)
    d_ = _addm(t_, t_)
    e_ = _addm(_addm(a_, a_), a_)
    f_ = _mulm(e_, e_)
    xd = _subm(f_, _addm(d_, d_))
    c8 = _addm(_addm(c_, c_), _addm(c_, c_))
    c8 = _addm(c8, c8)
    yd = _subm(_mulm(e_, _subm(d_, xd)), c8)
    zd = _mulm(_addm(y1, y1), z1)

    p_id = _is_zero_lanes(z1)
    q_id = _is_zero_lanes(z2)
    h_zero = _is_zero_lanes(h)
    r_zero = _is_zero_lanes(rr_)
    both = jnp.logical_and(jnp.logical_not(p_id), jnp.logical_not(q_id))
    use_dbl = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    use_id = jnp.logical_and(both, jnp.logical_and(h_zero, jnp.logical_not(r_zero)))

    one = jnp.stack(
        [jnp.full_like(x1[0], jnp.uint32(_R_LIMBS[k])) for k in range(L)]
    )
    zero = jnp.zeros_like(x1)

    def pick(add_v, dbl_v, idp_v, p_v, q_v):
        out = _sel(use_dbl, dbl_v, add_v)
        out = _sel(use_id, idp_v, out)
        out = _sel(jnp.logical_and(p_id, jnp.logical_not(q_id)), q_v, out)
        out = _sel(jnp.logical_and(p_id, q_id), idp_v, out)
        out = _sel(jnp.logical_and(q_id, jnp.logical_not(p_id)), p_v, out)
        return out

    ox = pick(x3, xd, one, x1, x2)
    oy = pick(y3, yd, one, y1, y2)
    oz = pick(z3, zd, zero, z1, z2)
    return ox, oy, oz


def _ec_add_kernel(x1r, y1r, z1r, x2r, y2r, z2r, oxr, oyr, ozr):
    ox, oy, oz = _ec_add_body(x1r[:], y1r[:], z1r[:], x2r[:], y2r[:], z2r[:])
    oxr[:] = ox
    oyr[:] = oy
    ozr[:] = oz


@functools.lru_cache(maxsize=None)
def _ec_add_call(n: int, tile: int):
    spec = lambda: pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):
        return pl.pallas_call(
            _ec_add_kernel,
            grid=(n // tile,),
            in_specs=[spec() for _ in range(6)],
            out_specs=[spec() for _ in range(3)],
            out_shape=[jax.ShapeDtypeStruct((L, n), jnp.uint32)] * 3,
        )(x1, y1, z1, x2, y2, z2)

    return run


def ec_add_lf(p: Dict, q: Dict) -> Dict:
    """Branchless EC add on limbs-first (L, N) point dicts (N mult of 128)."""
    n = p["x"].shape[1]
    if n >= PALLAS_MIN and n % 128 == 0:
        tile = min(TILE, n)
        ox, oy, oz = _ec_add_call(n, tile)(
            p["x"], p["y"], p["z"], q["x"], q["y"], q["z"]
        )
        return {"x": ox, "y": oy, "z": oz}
    # small fallback: portable jnp path in batch-major layout
    pb = {k: jnp.transpose(v, (1, 0)) for k, v in p.items()}
    qb = {k: jnp.transpose(v, (1, 0)) for k, v in q.items()}
    out = jec.ec_add(pb, qb)
    return {k: jnp.transpose(v, (1, 0)) for k, v in out.items()}


def identity_lf(n: int) -> Dict:
    one = jnp.broadcast_to(
        jnp.asarray(np.asarray(Fq.r_limbs, dtype=np.uint32))[:, None], (L, n)
    )
    return {"x": one, "y": one, "z": jnp.zeros((L, n), jnp.uint32)}


# ---------------------------------------------------------------------------
# prefix scan of EC adds (recursive even/odd halving, 2N work)
# ---------------------------------------------------------------------------


def _interleave(a: Dict, b: Dict) -> Dict:
    """a[i], b[i] alternating -> (L, 2n)."""
    out = {}
    for k in a:
        s = jnp.stack([a[k], b[k]], axis=2)  # (L, n, 2)
        out[k] = s.reshape(a[k].shape[0], -1)
    return out


def ec_prefix_scan(pts: Dict) -> Dict:
    """Inclusive prefix sums of a (L, N) point batch (N a power of two)."""
    n = pts["x"].shape[1]
    if n == 1:
        return pts
    even = {k: v[:, 0::2] for k, v in pts.items()}
    odd = {k: v[:, 1::2] for k, v in pts.items()}
    pair = ec_add_lf(even, odd)
    scanned = ec_prefix_scan(pair)  # prefix at odd output positions
    # even output positions: scanned(prev pair) + even
    shifted = {
        k: jnp.concatenate([jnp.zeros((L, 1), jnp.uint32), v[:, :-1]], axis=1)
        if k == "z"
        else jnp.concatenate(
            [jnp.asarray(np.asarray(Fq.r_limbs, np.uint32))[:, None], v[:, :-1]],
            axis=1,
        )
        for k, v in scanned.items()
    }
    even_out = ec_add_lf(shifted, even)
    return _interleave(even_out, scanned)


# ---------------------------------------------------------------------------
# MSM
# ---------------------------------------------------------------------------


def _to_lf(pts_bm: Dict) -> Dict:
    return {k: jnp.transpose(v, (1, 0)) for k, v in pts_bm.items()}


def _from_lf(pts_lf: Dict) -> Dict:
    return {k: jnp.transpose(v, (1, 0)) for k, v in pts_lf.items()}


@functools.partial(jax.jit, static_argnums=(2,))
def _window_total(points_bm: Dict, digits: jnp.ndarray, nbuckets: int) -> Dict:
    """One Pippenger window: points (N,L) batch-major dict + (N,) digits ->
    single Jacobian point (batch-major, shape (L,) coords) worth sum_b b*S_b.
    """
    n = digits.shape[0]
    order = jnp.argsort(-digits.astype(jnp.int32))
    d_sorted = jnp.take(digits, order)
    pts_sorted = {k: jnp.take(v, order, axis=0) for k, v in points_bm.items()}
    prefix = ec_prefix_scan(_to_lf(pts_sorted))  # (L, N) inclusive
    prefix_bm = _from_lf(prefix)

    d_next = jnp.concatenate([d_sorted[1:], jnp.zeros((1,), jnp.uint32)])
    is_boundary = d_sorted != d_next
    scatter_idx = jnp.where(is_boundary, d_sorted, jnp.uint32(nbuckets))
    bucket_bm = {
        k: v
        for k, v in zip(
            ("x", "y", "z"),
            (
                jnp.broadcast_to(
                    jnp.asarray(np.asarray(Fq.r_limbs, np.uint32)), (nbuckets, L)
                ),
                jnp.broadcast_to(
                    jnp.asarray(np.asarray(Fq.r_limbs, np.uint32)), (nbuckets, L)
                ),
                jnp.zeros((nbuckets, L), jnp.uint32),
            ),
        )
    }
    bucket_bm = {
        k: bucket_bm[k].at[scatter_idx].set(prefix_bm[k], mode="drop")
        for k in ("x", "y", "z")
    }
    flags = (
        jnp.zeros((nbuckets,), jnp.uint32)
        .at[scatter_idx]
        .set(jnp.ones_like(scatter_idx), mode="drop")
    )

    # fill empty buckets with the nearest present prefix row from ABOVE —
    # a pure select scan, no field math (cheap on the VPU via XLA).
    def fill(a, b):
        pa, fa = a
        pb, fb = b
        return (
            {k: jnp.where((fb == 1)[:, None], pb[k], pa[k]) for k in pa},
            jnp.maximum(fa, fb),
        )

    filled, _ = jax.lax.associative_scan(
        fill, (bucket_bm, flags), axis=0, reverse=True
    )
    # sum of suffix sums T_v over v=1..B-1  ==  sum_b b * S_b
    sums = ec_prefix_scan(_to_lf(filled))
    last = {k: v[:, -1] for k, v in sums.items()}
    first = {k: v[:, 0] for k, v in _to_lf(filled).items()}
    # subtract T_0 (bucket 0 contributes nothing)
    neg_first = {"x": first["x"], "y": F.neg(Fq, first["y"]), "z": first["z"]}
    la = {k: v[None, :] for k, v in last.items()}
    nf = {k: v[None, :] for k, v in neg_first.items()}
    out = jec.ec_add(la, nf)
    return {k: v[0] for k, v in out.items()}


@functools.partial(jax.jit, static_argnums=(2,))
def _horner_step(total: Dict, wt: Dict, c: int) -> Dict:
    """total * 2^c + window_total, as ONE dispatched module per window (the
    eager per-doubling dispatch chain was tunnel-latency-bound)."""
    for _ in range(c):
        total = jec.ec_double(total)
    return jec.ec_add(total, wt)


def msm_pallas(points_bm: Dict, scalars_mont: jnp.ndarray) -> Dict:
    """Variable-base MSM on TPU: (n,) batch-major Jacobian points dict +
    (n, L) Montgomery scalars -> single Jacobian point dict (coords (L,)).

    16-bit windows == scalar limbs (no digit arithmetic); python window loop
    (all windows share compiled modules); Horner combine by 16 doublings.
    """
    n = scalars_mont.shape[0]
    assert n & (n - 1) == 0 and n >= PALLAS_MIN
    scal = F.from_mont(Fr, scalars_mont)  # (n, L) canonical 16-bit limbs
    # window size scales with n: the bucket-table EC scan costs 2*2^c adds
    # per window, so c=16 only pays off once n dominates it
    c = 16 if n >= (1 << 15) else 8
    per_limb = 16 // c
    num_windows = Fr.num_limbs * per_limb
    total = None
    for w in range(num_windows - 1, -1, -1):
        limb = scal[:, w // per_limb]
        digits = (limb >> jnp.uint32(c * (w % per_limb))) & jnp.uint32((1 << c) - 1)
        wt = _window_total(points_bm, digits, 1 << c)
        total = wt if total is None else _horner_step(total, wt, c)
    return total
