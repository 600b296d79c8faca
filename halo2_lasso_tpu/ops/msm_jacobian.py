"""Pure-Jacobian halving-tree Pippenger MSM — the latency-free redesign.

Semantics: variable-base MSM (/root/reference/plonkish_backend/src/util/
arithmetic/msm.rs:84-181). Same window/sort/halving-pair structure as
ops/msm_affine.py, with the two latency walls of the batched-affine design
removed (measured on-chip at 2^16: 812ms total, of which ~464ms was the
sequential bucket/Horner epilogue and most of the rest the chunked batch-
inversion scans + their 254-step Fermat terminals):

  * every pair combine / bucket flush is ONE branchless complete Jacobian
    add (23 field muls, dependency-level lane-concatenation so each level
    module contains ~6 wide pallas mul dispatches and ZERO sequential
    scans). Jacobian costs ~2.3x the muls of the affine trick but needs no
    batch inversion at all — on a TPU the VPU is throughput-rich and
    latency-poor, so trading muls for scan-free modules wins ~5x;
  * the bucket epilogue is a BIT-PLANE reduction: bucket (w, v) carries
    weight v*2^{cw}; since v < 2^c the global weight bits of different
    windows never overlap, so sum_v v*S_{w,v}*2^{cw} = sum_b 2^b * U_b with
    U_{w,j} = sum of buckets in window w whose index has bit j set. The
    U_{w,j} come from a log-depth masked pairwise tree (c*W*B add-lanes
    total, ~10 levels); the final 254-bit power-of-two recombination — a
    ~253-step inherently sequential double-and-add — runs on the HOST with
    python-int Jacobian arithmetic (microseconds; device transfer is c*W
    points = ~50KB).

Tree/epilogue module shapes depend only on (W, B) and the level lane count
W*n/2^j — the size-n MSM's levels are exactly the tail of the size-2n MSM's,
so the prover's mixed-size MSMs share one persisted compile set.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.ops.field import LIMB_BITS
from halo2_lasso_tpu.ops.msm_affine import (
    L,
    LANE,
    _best_c,
    _digits_all,
    _iszero_lf,
    _on_accel,
    add_lf,
    mul_lf,
    mul_lf_traced,
    sub_lf,
)


def jac_add(spec, px, py, pz, qx, qy, qz):
    """Complete Jacobian add on (L, X) limbs-first coords — ONE fused pallas
    kernel when the shape is tile-friendly (all ~23 muls + selects in a
    single VMEM-resident pass; measured ~4x the lane-concatenated multi-
    dispatch path it replaces), else the traced jac_add_lf fallback."""
    n = px.shape[1]
    if spec.name == Fq.name and _on_accel() and n % LANE == 0 and n >= 256:
        from halo2_lasso_tpu.ops.pallas_ec import TILE_S, _ec_add_call

        S = n // LANE
        if S <= TILE_S or S % TILE_S == 0:
            ox, oy, oz = _ec_add_call(n)(px, py, pz, qx, qy, qz)
            return ox, oy, oz
    return jac_add_lf(spec, px, py, pz, qx, qy, qz)


def _mulcat(spec, pairs: List[Tuple[jnp.ndarray, jnp.ndarray]]):
    """One wide elementwise Montgomery mul for a dependency level: the k
    operand pairs (each (L, X)) are lane-concatenated so the pallas tile
    kernel sees a single (L, k*X) dispatch."""
    k = len(pairs)
    if k == 1:
        return [mul_lf(pairs[0][0], pairs[0][1], spec)]
    a = jnp.concatenate([p[0] for p in pairs], axis=1)
    b = jnp.concatenate([p[1] for p in pairs], axis=1)
    out = mul_lf(a, b, spec)
    X = pairs[0][0].shape[1]
    return [out[:, i * X : (i + 1) * X] for i in range(k)]


def _dbl2(spec, a):
    return add_lf(a, a, spec)


def jac_add_lf(spec, px, py, pz, qx, qy, qz):
    """Branchless complete Jacobian addition, limbs-first (L, X) coords.

    add-2007-bl with the doubling tail computed in the same dependency
    levels (mirrors ops/ec.ec_add, which is batch-major; this variant keeps
    limbs-first layout so the muls ride the tile-aligned pallas kernels).
    Identity is z == 0. 23 muls in 6 lane-concatenated dispatches."""
    X1, Y1, Z1, X2, Y2, Z2 = px, py, pz, qx, qy, qz
    Z1Z1, Z2Z2, A2, B2, ZZ12 = _mulcat(
        spec, [(Z1, Z1), (Z2, Z2), (X1, X1), (Y1, Y1), (Z1, Z2)]
    )
    E2 = add_lf(_dbl2(spec, A2), A2, spec)  # 3*X1^2
    X1B2 = add_lf(X1, B2, spec)
    U1, U2, T1, T2, C2, Td2, Fv2, Zd3 = _mulcat(
        spec,
        [
            (X1, Z2Z2),
            (X2, Z1Z1),
            (Y1, Z2),
            (Y2, Z1),
            (B2, B2),
            (X1B2, X1B2),
            (E2, E2),
            (_dbl2(spec, Y1), Z1),
        ],
    )
    S1, S2 = _mulcat(spec, [(T1, Z2Z2), (T2, Z1Z1)])
    H = sub_lf(U2, U1, spec)
    Rr = sub_lf(S2, S1, spec)

    # doubling tail (dbl-2009-l pieces already computed above)
    td = sub_lf(sub_lf(Td2, A2, spec), C2, spec)
    Dd = _dbl2(spec, td)
    Xd3 = sub_lf(Fv2, _dbl2(spec, Dd), spec)
    C8 = _dbl2(spec, _dbl2(spec, _dbl2(spec, C2)))

    HH, RR = _mulcat(spec, [(H, H), (Rr, Rr)])
    HHH, V, Z3, Yd3h = _mulcat(
        spec, [(HH, H), (U1, HH), (ZZ12, H), (E2, sub_lf(Dd, Xd3, spec))]
    )
    Yd3 = sub_lf(Yd3h, C8, spec)
    X3 = sub_lf(sub_lf(RR, HHH, spec), _dbl2(spec, V), spec)
    Y3h, S1HHH = _mulcat(spec, [(Rr, sub_lf(V, X3, spec)), (S1, HHH)])
    Y3 = sub_lf(Y3h, S1HHH, spec)

    p_id = _iszero_lf(Z1)
    q_id = _iszero_lf(Z2)
    h0 = _iszero_lf(H)
    r0 = _iszero_lf(Rr)
    both = jnp.logical_and(jnp.logical_not(p_id), jnp.logical_not(q_id))
    use_dbl = jnp.logical_and(both, jnp.logical_and(h0, r0))
    use_id = jnp.logical_and(both, jnp.logical_and(h0, jnp.logical_not(r0)))

    def pick(add_v, dbl_v, if_p_id, if_q_id):
        """if_p_id = Q's coord (result when P = O), if_q_id = P's coord."""
        v = jnp.where(use_dbl[None, :], dbl_v, add_v)
        v = jnp.where(use_id[None, :], jnp.zeros_like(v), v)
        v = jnp.where(p_id[None, :], if_p_id, v)
        v = jnp.where(
            q_id[None, :],
            jnp.where(p_id[None, :], jnp.zeros_like(v), if_q_id),
            v,
        )
        return v

    x3 = pick(X3, Xd3, X2, X1)
    y3 = pick(Y3, Yd3, Y2, Y1)
    z3 = pick(Z3, Zd3, Z2, Z1)
    # p == -q: force z = 0 (x/y already zeroed by pick's use_id branch)
    z3 = jnp.where(use_id[None, :], jnp.zeros_like(z3), z3)
    return x3, y3, z3


# ---------------------------------------------------------------------------
# halving level: pair combine / bucket flush, one unified add
# ---------------------------------------------------------------------------


def _level_step(x, y, z, dig, bx, by, bz, B: int, W: int, spec):
    """One halving level over (L, m) slot arrays (m = W * per-window slots).

    Logical adjacent slots (2i, 2i+1): equal digits -> survivor = A + B;
    digit boundary -> A is the END of its digit run (sorted desc, order
    preserved by halving), flush bucket[w, da] += A and B survives. Both
    cases share one complete Jacobian add (operand-selected); the scatter
    is conflict-free (<= one boundary per digit per window per level).

    Storage is BIT-REVERSED within each window block (prologue emits it),
    so the logical pair (2i, 2i+1) is the contiguous (first-half[i],
    second-half[i]) of the block at EVERY level and the survivor array is
    already next level's layout — no stride-2 lane de-interleave anywhere
    (the same trick as ops/pallas_field.py's hypercube storage)."""
    m = x.shape[1]
    half = m // 2
    mw = m // W  # per-window slots

    def halves(a):
        t = a.reshape(L, W, mw)
        return (
            t[:, :, : mw // 2].reshape(L, half),
            t[:, :, mw // 2 :].reshape(L, half),
        )

    xa, xb = halves(x)
    ya, yb = halves(y)
    za, zb = halves(z)
    dt = dig.reshape(W, mw)
    da = dt[:, : mw // 2].reshape(half)
    db = dt[:, mw // 2 :].reshape(half)

    same = da == db
    widx = jnp.arange(half, dtype=jnp.uint32) // jnp.uint32(half // W)
    gslot = widx * jnp.uint32(B) + da

    # unified add: same-digit pairs combine A + B; boundary pairs pass A
    # through (q forced to identity). The flushed value then reaches its
    # bucket via an INDEX scatter + small gather + one W*B-wide add — a
    # direct (L, half) point-coordinate scatter makes XLA:TPU relayout the
    # 16-limb axis into lanes (8x padding, 1.6GB copies at 2^18 slices).
    sm = same[None, :]
    qx_, qy_, qz_ = (
        jnp.where(sm, xb, xa),
        jnp.where(sm, yb, ya),
        jnp.where(sm, zb, jnp.zeros_like(za)),
    )
    rx, ry, rz = jac_add(spec, xa, ya, za, qx_, qy_, qz_)

    sx = jnp.where(sm, rx, xb)
    sy = jnp.where(sm, ry, yb)
    sz = jnp.where(sm, rz, zb)

    bslot = jnp.where(same, jnp.int32(W * B), gslot.astype(jnp.int32))
    lane_of = (
        jnp.zeros(W * B, jnp.int32)
        .at[bslot]
        .set(jnp.arange(1, half + 1, dtype=jnp.int32), mode="drop")
    )
    has = lane_of > 0
    fx = jnp.take(rx, lane_of - 1, axis=1, mode="clip")
    fy = jnp.take(ry, lane_of - 1, axis=1, mode="clip")
    fz = jnp.where(
        has[None, :], jnp.take(rz, lane_of - 1, axis=1, mode="clip"), 0
    )
    bx, by, bz = jac_add(spec, bx, by, bz, fx, fy, fz)
    return sx, sy, sz, db, bx, by, bz


@functools.lru_cache(maxsize=None)
def _level_fn(m: int, W: int, B: int, spec=Fq):
    def f(x, y, z, dig, bx, by, bz):
        return _level_step(x, y, z, dig, bx, by, bz, B, W, spec)

    return jax.jit(f) if _on_accel() else f


# ---------------------------------------------------------------------------
# prologue: digits, per-window desc sort, gather
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _prologue_fn(c: int, W: int, base=Fq, scalar=Fr):
    from halo2_lasso_tpu.ops import field as F

    def f(points_x, points_y, points_z, scalars_mont):
        from halo2_lasso_tpu.ops.pallas_field import _bitrev_indices

        scal = F.from_mont(scalar, scalars_mont)
        digits = _digits_all(scal, c, W)  # (W, n)
        order = jnp.argsort(-digits.astype(jnp.int32), axis=1)  # desc
        n = order.shape[1]
        # store sorted rank r at physical position bitrev(r) within each
        # window block: every level's logical pairs become contiguous halves
        br = jnp.asarray(_bitrev_indices(n.bit_length() - 1))
        order = jnp.take(order, br, axis=1)
        flat = order.reshape(-1)
        x = jnp.take(jnp.transpose(points_x, (1, 0)), flat, axis=1)
        y = jnp.take(jnp.transpose(points_y, (1, 0)), flat, axis=1)
        z = jnp.take(jnp.transpose(points_z, (1, 0)), flat, axis=1)
        dig = jnp.take_along_axis(digits, order, axis=1).reshape(-1)
        # digit-0 lanes contribute nothing: identity (z = 0)
        z = jnp.where((dig == 0)[None, :], jnp.zeros_like(z), z)
        return x, y, z, dig

    return jax.jit(f) if _on_accel() else f


# ---------------------------------------------------------------------------
# epilogue: final flush + bit-plane bucket tree (device), Horner (host)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _final_flush_fn(W: int, B: int, spec=Fq):
    def f(x, y, z, dig, bx, by, bz):
        gslot = jnp.arange(W, dtype=jnp.uint32) * jnp.uint32(B) + dig
        gx = jnp.take(bx, gslot, axis=1)
        gy = jnp.take(by, gslot, axis=1)
        gz = jnp.take(bz, gslot, axis=1)
        rx, ry, rz = jac_add(spec, gx, gy, gz, x, y, z)
        bx = bx.at[:, gslot].set(rx)
        by = by.at[:, gslot].set(ry)
        bz = bz.at[:, gslot].set(rz)
        return bx, by, bz

    return jax.jit(f) if _on_accel() else f


@functools.lru_cache(maxsize=None)
def _bitplane_expand_fn(c: int, W: int, B: int, spec=Fq):
    """(L, W*B) buckets -> (L, c*W*B) masked copies: plane j keeps bucket v
    iff bit j of v is set (others -> identity via z = 0)."""

    def f(bx, by, bz):
        v = jnp.tile(jnp.arange(B, dtype=jnp.uint32), (W,))  # (W*B,)
        keep = jnp.concatenate(
            [((v >> jnp.uint32(j)) & 1).astype(bool) for j in range(c)]
        )  # (c*W*B,)
        xt = jnp.tile(bx, (1, c))
        yt = jnp.tile(by, (1, c))
        zt = jnp.tile(bz, (1, c))
        zt = jnp.where(keep[None, :], zt, jnp.zeros_like(zt))
        return xt, yt, zt

    return jax.jit(f) if _on_accel() else f


@functools.lru_cache(maxsize=None)
def _tree_level_fn(lanes: int, groups: int, spec=Fq):
    """Pairwise tree-sum level: (L, lanes) holding `groups` contiguous
    segments -> (L, lanes/2), adding each segment's first half to its
    second half (segment-internal sum order is irrelevant — it's a sum)."""

    def f(x, y, z):
        G = lanes // groups

        def split(a):
            t = a.reshape(L, groups, G)
            return (
                t[:, :, : G // 2].reshape(L, -1),
                t[:, :, G // 2 :].reshape(L, -1),
            )

        x0, x1 = split(x)
        y0, y1 = split(y)
        z0, z1 = split(z)
        return jac_add(spec, x0, y0, z0, x1, y1, z1)

    return jax.jit(f) if _on_accel() else f


def _host_jac_add(p, q, mod):
    """Python-int complete Jacobian add (epilogue recombination)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    if Z1 == 0:
        return q
    if Z2 == 0:
        return p
    Z1Z1 = Z1 * Z1 % mod
    Z2Z2 = Z2 * Z2 % mod
    U1 = X1 * Z2Z2 % mod
    U2 = X2 * Z1Z1 % mod
    S1 = Y1 * Z2 * Z2Z2 % mod
    S2 = Y2 * Z1 * Z1Z1 % mod
    if U1 == U2:
        if S1 != S2:
            return (0, 0, 0)
        return _host_jac_double(p, mod)
    H = (U2 - U1) % mod
    R = (S2 - S1) % mod
    HH = H * H % mod
    HHH = HH * H % mod
    V = U1 * HH % mod
    X3 = (R * R - HHH - 2 * V) % mod
    Y3 = (R * (V - X3) - S1 * HHH) % mod
    Z3 = Z1 * Z2 * H % mod
    return (X3, Y3, Z3)


def _host_jac_double(p, mod):
    X1, Y1, Z1 = p
    if Z1 == 0 or Y1 == 0:
        return (0, 0, 0)
    A = X1 * X1 % mod
    B = Y1 * Y1 % mod
    C = B * B % mod
    D = 2 * ((X1 + B) * (X1 + B) - A - C) % mod
    E = 3 * A % mod
    Fv = E * E % mod
    X3 = (Fv - 2 * D) % mod
    Y3 = (E * (D - X3) - 8 * C) % mod
    Z3 = 2 * Y1 * Z1 % mod
    return (X3, Y3, Z3)


# ---------------------------------------------------------------------------
# windowed fixed-base MSM (SRS generation / test point batches)
# ---------------------------------------------------------------------------


def _host_batch_affine(pts, mod):
    """[(X, Y, Z)] jacobian ints -> [(x, y)] affine ((0,0) for identity),
    one modular inversion total (Montgomery trick)."""
    zs = [p[2] for p in pts]
    pref = [1]
    for z in zs:
        pref.append(pref[-1] * (z if z else 1) % mod)
    inv = pow(pref[-1], mod - 2, mod)
    out = [None] * len(pts)
    for i in range(len(pts) - 1, -1, -1):
        z = zs[i]
        if z == 0:
            out[i] = (0, 0)
            inv_i = None
        else:
            inv_i = inv * pref[i] % mod
            inv = inv * z % mod
        if inv_i is not None:
            zi2 = inv_i * inv_i % mod
            out[i] = (pts[i][0] * zi2 % mod, pts[i][1] * zi2 * inv_i % mod)
    return out


_FB_TABLE_CACHE: Dict[Tuple, Tuple] = {}


def _fb_table(base_xy: Tuple[int, int], c: int, nbits: int, spec):
    """Per-base windowed table (msm.rs:16-65 semantics, built ONCE on the
    host with bigints — W*B point ops in tens of ms — then uploaded):
    T[w, v] = v * 2^{c*w} * G, stored limbs-first affine + z-row (identity
    for v = 0). W is padded to a power of two so the per-call reduction is
    a uniform halving tree."""
    W = -(-nbits // c)
    Wp = 1 << (W - 1).bit_length()
    key = (base_xy, c, nbits, spec.name)
    hit = _FB_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    mod = spec.modulus
    B = 1 << c
    rows = []
    g = (base_xy[0], base_xy[1], 1)
    for w in range(W):
        row = [(0, 0, 0)]
        for v in range(1, B):
            row.append(_host_jac_add(row[-1], g, mod))
        rows.extend(row)
        for _ in range(c):
            g = _host_jac_double(g, mod)
    rows.extend([(0, 0, 0)] * ((Wp - W) * B))
    aff = _host_batch_affine(rows, mod)
    xs = spec.encode([a[0] for a in aff])
    ys = spec.encode([a[1] for a in aff])
    tx = jnp.asarray(np.asarray(xs, np.uint32).T)  # (L, Wp*B)
    ty = jnp.asarray(np.asarray(ys, np.uint32).T)
    one = np.asarray(spec.r_limbs, np.uint32)
    zcol = np.zeros((Wp * B, L), np.uint32)
    fin = np.array([p[2] != 0 for p in rows], bool)
    zcol[fin] = one
    tz = jnp.asarray(zcol.T)
    out = (Wp, tx, ty, tz)
    _FB_TABLE_CACHE[key] = out
    return out


@functools.lru_cache(maxsize=None)
def _fb_gather_fn(c: int, W: int, Wp: int, base=Fq, scalar=Fr):
    from halo2_lasso_tpu.ops import field as F

    B = 1 << c

    def f(tx, ty, tz, scalars_mont):
        scal = F.from_mont(scalar, scalars_mont)
        digits = _digits_all(scal, c, W)  # (W, n)
        n = digits.shape[1]
        woff = (jnp.arange(W, dtype=jnp.uint32) * jnp.uint32(B))[:, None]
        idx = (digits + woff).reshape(-1)  # (W*n,)
        x = jnp.take(tx, idx, axis=1)
        y = jnp.take(ty, idx, axis=1)
        z = jnp.take(tz, idx, axis=1)
        if Wp != W:
            pad = jnp.zeros((L, (Wp - W) * n), jnp.uint32)
            x = jnp.concatenate([x, pad], axis=1)
            y = jnp.concatenate([y, pad], axis=1)
            z = jnp.concatenate([z, pad], axis=1)
        return x, y, z

    return jax.jit(f) if _on_accel() else f


@functools.lru_cache(maxsize=None)
def _fb_reduce_fn(lanes: int, spec=Fq):
    """One halving level over the leading window axis of (L, 2h*n)."""

    def f(x, y, z):
        h = x.shape[1] // 2
        return jac_add(
            spec, x[:, :h], y[:, :h], z[:, :h], x[:, h:], y[:, h:], z[:, h:]
        )

    return jax.jit(f) if _on_accel() else f


def fixed_base_msm_windowed(
    base_xy: Tuple[int, int],
    scalars_mont: jnp.ndarray,
    nbits: int = 254,
    base=None,
    scalar=None,
    c: int = 8,
) -> Dict:
    """[s_i]*G for a batch of scalars via the cached per-base window table:
    W gathers + a log-depth Jacobian tree per point (vs the 254 sequential
    double/adds of the naive ladder). Returns a batch-major (n,) point dict."""
    base = base or Fq
    scalar = scalar or Fr
    W = -(-nbits // c)
    Wp, tx, ty, tz = _fb_table(base_xy, c, nbits, base)
    n = scalars_mont.shape[0]
    x, y, z = _fb_gather_fn(c, W, Wp, base, scalar)(tx, ty, tz, scalars_mont)
    while x.shape[1] > n:
        x, y, z = _fb_reduce_fn(x.shape[1], base)(x, y, z)
    return {
        "x": jnp.transpose(x, (1, 0)),
        "y": jnp.transpose(y, (1, 0)),
        "z": jnp.transpose(z, (1, 0)),
    }


def _device_partials(
    points_bm: Dict, scalars_mont: jnp.ndarray, base, scalar
) -> Tuple[jnp.ndarray, int, int]:
    """Device side of the MSM, fully async (no host sync): prologue,
    halving levels, final flush, bit-plane bucket tree. Returns the
    ((L, 3*c*W) concat of U partials, c, W)."""
    n = scalars_mont.shape[0]
    assert n & (n - 1) == 0
    c = _best_c(n, scalar.num_bits)
    B = 1 << c
    W = -(-scalar.num_bits // c)

    x, y, z, dig = _prologue_fn(c, W, base, scalar)(
        points_bm["x"], points_bm["y"], points_bm["z"], scalars_mont
    )

    bx = jnp.zeros((L, W * B), jnp.uint32)
    by = jnp.zeros((L, W * B), jnp.uint32)
    bz = jnp.zeros((L, W * B), jnp.uint32)

    m = n
    while m > 1:
        x, y, z, dig, bx, by, bz = _level_fn(m, W, B, base)(
            x, y, z, dig, bx, by, bz
        )
        m //= 2

    bx, by, bz = _final_flush_fn(W, B, base)(x, y, z, dig, bx, by, bz)

    tx, ty, tz = _bitplane_expand_fn(c, W, B, base)(bx, by, bz)
    groups = c * W
    while tx.shape[1] > groups:
        tx, ty, tz = _tree_level_fn(tx.shape[1], groups, base)(tx, ty, tz)
    return jnp.concatenate([tx, ty, tz], axis=1), c, W


@functools.lru_cache(maxsize=None)
def _prologue_seg_fn(c: int, W: int, S: int, n_pad: int, base=Fq, scalar=Fr):
    """Segmented prologue: S independent MSMs (each padded to n_pad points,
    zero scalars on the pad) laid out as S*W Pippenger windows of ONE
    pipeline. Points arrive concatenated (S*n_pad,); window row s*W+w holds
    segment s's digits for window w, sorted desc + bit-reversed exactly
    like the single-MSM prologue."""
    from halo2_lasso_tpu.ops import field as F

    def f(points_x, points_y, points_z, scalars_mont):
        from halo2_lasso_tpu.ops.pallas_field import _bitrev_indices

        scal = F.from_mont(scalar, scalars_mont)
        digits = _digits_all(scal, c, W)  # (W, S*n_pad)
        d = jnp.transpose(digits.reshape(W, S, n_pad), (1, 0, 2)).reshape(
            S * W, n_pad
        )
        order = jnp.argsort(-d.astype(jnp.int32), axis=1)  # desc per row
        br = jnp.asarray(_bitrev_indices(n_pad.bit_length() - 1))
        order = jnp.take(order, br, axis=1)
        seg_off = (
            (jnp.arange(S * W, dtype=jnp.uint32) // jnp.uint32(W))
            * jnp.uint32(n_pad)
        )[:, None]
        flat = (order.astype(jnp.uint32) + seg_off).reshape(-1)
        x = jnp.take(jnp.transpose(points_x, (1, 0)), flat, axis=1)
        y = jnp.take(jnp.transpose(points_y, (1, 0)), flat, axis=1)
        z = jnp.take(jnp.transpose(points_z, (1, 0)), flat, axis=1)
        dig = jnp.take_along_axis(d, order, axis=1).reshape(-1)
        z = jnp.where((dig == 0)[None, :], jnp.zeros_like(z), z)
        return x, y, z, dig

    return jax.jit(f) if _on_accel() else f


def _device_partials_seg(
    jobs, base, scalar, n_pad: int
) -> Tuple[jnp.ndarray, int, int]:
    """S padded same-size MSMs through ONE device pipeline (prologue,
    levels, flush, bit-plane tree) with W_total = S*W windows. Returns
    ((L, 3*c*S*W) U partials, c, W). Cuts the per-MSM fixed pipeline cost
    (the KZG quotient-open wall: 16 sizes = 16 pipelines) by ~S."""
    S = len(jobs)
    c = _best_c(n_pad, scalar.num_bits)
    B = 1 << c
    W = -(-scalar.num_bits // c)
    Wt = S * W

    def padded(points, scal):
        n = scal.shape[0]
        if n == n_pad:
            return points, scal
        pad = n_pad - n
        from halo2_lasso_tpu.ops.ec import identity_point

        idp = identity_point((pad,), base)
        return (
            {k: jnp.concatenate([v, idp[k]]) for k, v in points.items()},
            jnp.concatenate([scal, jnp.zeros((pad, scal.shape[1]), jnp.uint32)]),
        )

    pts_l, scal_l = zip(*(padded(p, s) for p, s in jobs))
    px = jnp.concatenate([p["x"] for p in pts_l])
    py = jnp.concatenate([p["y"] for p in pts_l])
    pz = jnp.concatenate([p["z"] for p in pts_l])
    scal = jnp.concatenate(scal_l)

    x, y, z, dig = _prologue_seg_fn(c, W, S, n_pad, base, scalar)(px, py, pz, scal)

    bx = jnp.zeros((L, Wt * B), jnp.uint32)
    by = jnp.zeros((L, Wt * B), jnp.uint32)
    bz = jnp.zeros((L, Wt * B), jnp.uint32)

    m = Wt * n_pad
    while m > Wt:
        x, y, z, dig, bx, by, bz = _level_fn(m, Wt, B, base)(
            x, y, z, dig, bx, by, bz
        )
        m //= 2

    bx, by, bz = _final_flush_fn(Wt, B, base)(x, y, z, dig, bx, by, bz)

    tx, ty, tz = _bitplane_expand_fn(c, Wt, B, base)(bx, by, bz)
    groups = c * Wt
    while tx.shape[1] > groups:
        tx, ty, tz = _tree_level_fn(tx.shape[1], groups, base)(tx, ty, tz)
    return jnp.concatenate([tx, ty, tz], axis=1), c, W


def _finish_host_segments(all_u, c: int, W: int, S: int, mod: int):
    """Per-segment power-of-two recombination of a segmented partial stack:
    partial layout is [j * (S*W) + s*W + w]; segment s reads the (c, W)
    sub-grid at its window block."""
    Wt = S * W
    groups = c * Wt
    ux, uy, uz = all_u[:groups], all_u[groups : 2 * groups], all_u[2 * groups :]
    totals = []
    for s in range(S):
        seg = np.empty(3 * c * W, dtype=object)
        for j in range(c):
            for w in range(W):
                src = j * Wt + s * W + w
                dst = j * W + w
                seg[dst] = ux[src]
                seg[c * W + dst] = uy[src]
                seg[2 * c * W + dst] = uz[src]
        totals.append(_finish_host(seg, c, W, mod))
    return totals


def _finish_host(all_u, c: int, W: int, mod: int) -> Tuple[int, int, int]:
    """sum_{w,j} 2^{c*w+j} * U_{w,j} — the inherently sequential 254-bit
    power-of-two recombination, in host bigints (microseconds)."""
    groups = c * W
    ux, uy, uz = all_u[:groups], all_u[groups : 2 * groups], all_u[2 * groups :]
    by_bit = {}
    for j in range(c):
        for w in range(W):
            pt = (int(ux[j * W + w]), int(uy[j * W + w]), int(uz[j * W + w]))
            if pt[2] != 0:
                by_bit[c * w + j] = pt
    total = (0, 0, 0)
    for b in range(max(by_bit) if by_bit else 0, -1, -1):
        total = _host_jac_double(total, mod)
        if b in by_bit:
            total = _host_jac_add(total, by_bit[b], mod)
    return total


# above this many points, one MSM is split into slices summed on the host:
# the halving levels materialize (L, W*n) x 3 coords x in+out, which blows
# past the 16G HBM somewhere above 2^18 points per slice
_MSM_SLICE = 1 << 18


def msm(
    points_bm: Dict,
    scalars_mont: jnp.ndarray,
    base=None,
    scalar=None,
) -> Dict:
    """Variable-base MSM: (n,) batch-major Jacobian point dict + (n, L)
    Montgomery scalars -> single Jacobian point (batch-major coords (L,)).
    n must be a power of two (padded by callers). ONE device->host pull
    (~50KB of U partials); the tunnel round-trip dominates anything else."""
    base = base or Fq
    scalar = scalar or Fr
    assert base.num_limbs == L
    n = scalars_mont.shape[0]
    parts = []
    c = W = None
    for off in range(0, n, _MSM_SLICE):
        tcat, c, W = _device_partials(
            {k: v[off : off + _MSM_SLICE] for k, v in points_bm.items()},
            scalars_mont[off : off + _MSM_SLICE],
            base,
            scalar,
        )
        parts.append(tcat)
    total = (0, 0, 0)
    for tcat in parts:
        all_u = base.decode(np.asarray(jnp.transpose(tcat, (1, 0))))
        total = _host_jac_add(
            total, _finish_host(all_u, c, W, base.modulus), base.modulus
        )
    enc = lambda v: jnp.asarray(base.encode([v]))[0]
    return {"x": enc(total[0]), "y": enc(total[1]), "z": enc(total[2])}


def msm_many_affine(
    points_bm: Dict,
    scalars_batch: jnp.ndarray,
    base=None,
    scalar=None,
) -> np.ndarray:
    """B MSMs over one shared point set: scalars (B, n, L) Montgomery ->
    host (B, 2) affine object ints (the batch_commit hot path). All B
    device pipelines are dispatched async; a SINGLE stacked transfer pulls
    every partial, and the sequential recombinations + the final affine
    conversion run on the host (one modular inversion total)."""
    base = base or Fq
    scalar = scalar or Fr
    B = scalars_batch.shape[0]
    n = scalars_batch.shape[1]
    slices = list(range(0, n, _MSM_SLICE))
    parts = []
    c = W = None
    for i in range(B):
        for off in slices:
            tcat, c, W = _device_partials(
                {k: v[off : off + _MSM_SLICE] for k, v in points_bm.items()},
                scalars_batch[i][off : off + _MSM_SLICE],
                base,
                scalar,
            )
            parts.append(tcat)
    stacked = np.asarray(jnp.stack(parts))  # (B*slices, L, 3*c*W) one pull
    mod = base.modulus
    totals = []
    for i in range(B):
        total = (0, 0, 0)
        for j in range(len(slices)):
            all_u = base.decode(stacked[i * len(slices) + j].T)
            total = _host_jac_add(total, _finish_host(all_u, c, W, mod), mod)
        totals.append(total)
    aff = _host_batch_affine(totals, mod)
    out = np.empty((B, 2), dtype=object)
    for i, (ax, ay) in enumerate(aff):
        out[i] = (ax, ay)
    return out
