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
from halo2_lasso_tpu.ops.pallas_field import _add_rows, _mul_rows, _sub_rows

TILE_S = 8  # sublane-rows per grid step: 8*128 = 1024 lanes/block
LANE = 128
PALLAS_MIN = 256  # below this many lanes the jnp combiner is used

L = Fq.num_limbs
_P_LIMBS = [int(v) for v in Fq.p_limbs]
_R_LIMBS = [int(v) for v in Fq.r_limbs]


# ---------------------------------------------------------------------------
# in-kernel field helpers on LISTS of (tile, 128) limb rows (v2 tile layout:
# shared with ops/pallas_field.py — each limb row is native (8, 128) VREGs)
# ---------------------------------------------------------------------------

def _addm(a, b):
    return _add_rows(Fq, a, b)


def _subm(a, b):
    return _sub_rows(Fq, a, b)


def _mulm(a, b):
    return _mul_rows(Fq, a, b)


def _is_zero_lanes(a):
    """list of L limb rows -> per-lane all-limbs-zero bool."""
    s = a[0].astype(jnp.int32)
    for k in range(1, L):
        s = s + a[k].astype(jnp.int32)  # limbs < 2^16, L terms: exact
    return s == 0


def _sel(mask, a, b):
    """per-lane select on row lists."""
    return [jnp.where(mask, a[k], b[k]) for k in range(L)]


def _rows(ref):
    """(L, tile, LANE) ref -> list of L (tile, LANE) rows."""
    v = ref[:]
    return [v[i] for i in range(L)]


def _ec_add_body(x1, y1, z1, x2, y2, z2):
    """Full branchless Jacobian add (+fused double) on limb-row lists."""
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

    one = [jnp.full_like(x1[0], jnp.uint32(_R_LIMBS[k])) for k in range(L)]
    zero = [jnp.zeros_like(x1[0]) for _ in range(L)]

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
    ox, oy, oz = _ec_add_body(
        _rows(x1r), _rows(y1r), _rows(z1r), _rows(x2r), _rows(y2r), _rows(z2r)
    )
    oxr[:] = jnp.stack(ox, axis=0)
    oyr[:] = jnp.stack(oy, axis=0)
    ozr[:] = jnp.stack(oz, axis=0)


@functools.lru_cache(maxsize=None)
def _ec_add_call(n: int):
    """n lanes (mult of 128): kernel over (L, tile, 128) 3D blocks; the
    (L, n) <-> (L, n/128, 128) reshape at the call boundary is free
    (row-major)."""
    S = n // LANE
    tile = min(TILE_S, S)
    spec = lambda: pl.BlockSpec(
        (L, tile, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):
        args = [v.reshape(L, S, LANE) for v in (x1, y1, z1, x2, y2, z2)]
        outs = pl.pallas_call(
            _ec_add_kernel,
            grid=(S // tile,),
            in_specs=[spec() for _ in range(6)],
            out_specs=[spec() for _ in range(3)],
            out_shape=[jax.ShapeDtypeStruct((L, S, LANE), jnp.uint32)] * 3,
        )(*args)
        return [o.reshape(L, n) for o in outs]

    return run


def ec_add_lf(p: Dict, q: Dict) -> Dict:
    """Branchless EC add on limbs-first (L, N) point dicts (N mult of 128)."""
    n = p["x"].shape[1]
    if n >= PALLAS_MIN and n % 128 == 0:
        ox, oy, oz = _ec_add_call(n)(
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


def _digits_for_window(scal: jnp.ndarray, w: int, c: int) -> jnp.ndarray:
    """(n, L) canonical 16-bit limbs -> (n,) c-bit digit w (cross-limb)."""
    lo_bit = c * w
    lo_limb = lo_bit // LIMB_BITS
    off = lo_bit % LIMB_BITS
    val = scal[:, lo_limb] >> jnp.uint32(off)
    if off + c > LIMB_BITS and lo_limb + 1 < scal.shape[1]:
        val = val | (scal[:, lo_limb + 1] << jnp.uint32(LIMB_BITS - off))
    return val & jnp.uint32((1 << c) - 1)


def _best_c(n: int, nbits: int = 254) -> int:
    """Window size minimizing total adds: windows(c) * (2n point-scan +
    2*2^c bucket-scan)."""
    best, best_cost = 8, None
    for c in range(8, 17):
        windows = -(-nbits // c)
        cost = windows * (2 * n + 2 * (1 << c))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def msm_pallas(points_bm: Dict, scalars_mont: jnp.ndarray) -> Dict:
    """Variable-base MSM on TPU: (n,) batch-major Jacobian points dict +
    (n, L) Montgomery scalars -> single Jacobian point dict (coords (L,)).

    c-bit windows (c chosen by the adds-cost model, digits extracted across
    16-bit limb boundaries); python window loop (all windows share compiled
    modules); Horner combine by c doublings.
    """
    n = scalars_mont.shape[0]
    assert n & (n - 1) == 0 and n >= PALLAS_MIN
    scal = F.from_mont(Fr, scalars_mont)  # (n, L) canonical 16-bit limbs
    c = _best_c(n)
    num_windows = -(-254 // c)
    total = None
    for w in range(num_windows - 1, -1, -1):
        digits = _digits_for_window(scal, w, c)
        wt = _window_total(points_bm, digits, 1 << c)
        total = wt if total is None else _horner_step(total, wt, c)
    return total
