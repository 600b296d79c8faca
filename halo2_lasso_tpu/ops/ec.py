"""BN254 G1 arithmetic + multi-scalar multiplication, TPU-native.

Points on device are Jacobian (X, Y, Z) triples of packed-limb Fq elements
(identity: Z = 0); all group ops are branchless (jnp.where-selected complete
handling of identity/doubling/inverse cases) so they vectorize on the VPU and
are valid combiners for `jax.lax.associative_scan`.

MSM design (replaces the reference's serial-bucket Pippenger,
/root/reference/plonkish_backend/src/util/arithmetic/msm.rs:84-181, which is
a per-thread scatter loop — the wrong shape for SIMD):
  1. With c = 16-bit windows, the w-th digit of a scalar is exactly its w-th
     16-bit limb — no digit extraction arithmetic at all.
  2. Per window: sort point indices by digit descending (XLA u32 sort),
     gather points, then an inclusive `associative_scan` of ec_add gives all
     prefix sums A_i in log depth.
  3. Bucket aggregation uses the identity
         sum_b b*S_b = sum_i (d_i - d_{i+1}) * A_i  (sorted desc, d_{N+1}=0)
     so only the last-in-bucket prefix rows matter: scatter those A_i into a
     2^c bucket table, suffix-scan it, and tree-reduce — entirely regular,
     no data-dependent shapes.
  4. Window totals combine by 16 doublings per window (Horner).

Cost: ~2N vectorized ec_adds per window (the scan), 16 windows — ~32N total
vs ~16N for serial Pippenger, traded for full lane parallelism.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fq, Fr, G1_GEN
from halo2_lasso_tpu.ops.field import FieldSpec

# A Jacobian point batch is a dict {"x","y","z"} of (..., L) u32 mont arrays.


def identity_point(shape=()) -> dict:
    L = Fq.num_limbs
    zero = jnp.zeros(shape + (L,), dtype=jnp.uint32)
    one = jnp.broadcast_to(Fq.one, shape + (L,))
    return {"x": one, "y": one, "z": zero}


def affine_to_jacobian(pts_xy: np.ndarray) -> dict:
    """host (..., 2) object ints (canonical affine; (0,0) = identity) -> device dict."""
    pts_xy = np.asarray(pts_xy, dtype=object)
    xs = pts_xy[..., 0]
    ys = pts_xy[..., 1]
    is_id = np.logical_and(xs == 0, ys == 0)
    x = Fq.encode(np.where(is_id, 1, xs))
    y = Fq.encode(np.where(is_id, 1, ys))
    z = Fq.encode(np.where(is_id, 0, 1))
    return {"x": jnp.asarray(x), "y": jnp.asarray(y), "z": jnp.asarray(z)}


def jacobian_to_affine(pt: dict) -> np.ndarray:
    """device dict -> host (..., 2) object ints; identity -> (0, 0).
    Batch padded to a power of two (>= 16) for compile reuse."""
    z = pt["z"]
    batch = z.shape[:-1]
    flat = {k: v.reshape((-1, v.shape[-1])) for k, v in pt.items()}
    n = flat["z"].shape[0]
    target = max(16, 1 << (n - 1).bit_length()) if n > 1 else 16
    if target != n:
        flat = {
            k: jnp.concatenate([v, jnp.zeros((target - n, v.shape[1]), jnp.uint32)])
            for k, v in flat.items()
        }
    ax, ay = _to_affine_jit(flat)
    xs = Fq.decode(np.asarray(ax))[:n]
    ys = Fq.decode(np.asarray(ay))[:n]
    zzero = np.asarray(F.is_zero(Fq, flat["z"]))[:n]
    out = np.empty(xs.shape + (2,), dtype=object)
    out[..., 0] = np.where(zzero, 0, xs)
    out[..., 1] = np.where(zzero, 0, ys)
    return out.reshape(batch + (2,))


@jax.jit
def _to_affine_jit(flat: dict):
    zinv = F.batch_inv(Fq, flat["z"])
    zinv2 = F.mont_mul(Fq, zinv, zinv)
    zinv3 = F.mont_mul(Fq, zinv2, zinv)
    ax = F.mont_mul(Fq, flat["x"], zinv2)
    ay = F.mont_mul(Fq, flat["y"], zinv3)
    return ax, ay


def ec_double(p: dict) -> dict:
    """Jacobian doubling, a=0 (dbl-2009-l). Handles identity naturally (z=0)."""
    s = Fq
    X1, Y1, Z1 = p["x"], p["y"], p["z"]
    A = F.mont_mul(s, X1, X1)
    B = F.mont_mul(s, Y1, Y1)
    C = F.mont_mul(s, B, B)
    t = F.add(s, X1, B)
    t = F.mont_mul(s, t, t)
    t = F.sub(s, t, A)
    t = F.sub(s, t, C)
    D = F.add(s, t, t)  # 2((X1+B)^2 - A - C)
    E = F.add(s, F.add(s, A, A), A)  # 3A
    Fv = F.mont_mul(s, E, E)
    X3 = F.sub(s, Fv, F.add(s, D, D))
    C8 = F.add(s, F.add(s, C, C), F.add(s, C, C))
    C8 = F.add(s, C8, C8)
    Y3 = F.sub(s, F.mont_mul(s, E, F.sub(s, D, X3)), C8)
    Z3 = F.mont_mul(s, F.add(s, Y1, Y1), Z1)
    return {"x": X3, "y": Y3, "z": Z3}


def ec_add(p: dict, q: dict) -> dict:
    """Branchless general Jacobian addition (add-2007-bl) with full special-
    case handling: p=O, q=O, p==q (double), p==-q (identity)."""
    s = Fq
    X1, Y1, Z1 = p["x"], p["y"], p["z"]
    X2, Y2, Z2 = q["x"], q["y"], q["z"]
    Z1Z1 = F.mont_mul(s, Z1, Z1)
    Z2Z2 = F.mont_mul(s, Z2, Z2)
    U1 = F.mont_mul(s, X1, Z2Z2)
    U2 = F.mont_mul(s, X2, Z1Z1)
    S1 = F.mont_mul(s, F.mont_mul(s, Y1, Z2), Z2Z2)
    S2 = F.mont_mul(s, F.mont_mul(s, Y2, Z1), Z1Z1)
    H = F.sub(s, U2, U1)
    Rr = F.sub(s, S2, S1)

    HH = F.mont_mul(s, H, H)
    HHH = F.mont_mul(s, HH, H)
    V = F.mont_mul(s, U1, HH)
    RR = F.mont_mul(s, Rr, Rr)
    X3 = F.sub(s, F.sub(s, RR, HHH), F.add(s, V, V))
    Y3 = F.sub(s, F.mont_mul(s, Rr, F.sub(s, V, X3)), F.mont_mul(s, S1, HHH))
    Z3 = F.mont_mul(s, F.mont_mul(s, Z1, Z2), H)
    added = {"x": X3, "y": Y3, "z": Z3}

    doubled = ec_double(p)

    p_is_id = F.is_zero(s, Z1)
    q_is_id = F.is_zero(s, Z2)
    h_zero = F.is_zero(s, H)
    r_zero = F.is_zero(s, Rr)
    both = jnp.logical_and(jnp.logical_not(p_is_id), jnp.logical_not(q_is_id))
    use_double = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    use_identity = jnp.logical_and(both, jnp.logical_and(h_zero, jnp.logical_not(r_zero)))

    idp = identity_point(Z1.shape[:-1])
    out = {}
    for k in ("x", "y", "z"):
        v = added[k]
        v = F.select(use_double, doubled[k], v)
        v = F.select(use_identity, idp[k], v)
        v = F.select(jnp.logical_and(p_is_id, jnp.logical_not(q_is_id)), q[k], v)
        v = F.select(p_is_id & q_is_id, idp[k], v)
        v = F.select(jnp.logical_and(q_is_id, jnp.logical_not(p_is_id)), p[k], v)
        out[k] = v
    return out


def ec_neg(p: dict) -> dict:
    return {"x": p["x"], "y": F.neg(Fq, p["y"]), "z": p["z"]}


def ec_select(cond, p: dict, q: dict) -> dict:
    """where(cond, p, q) — cond shape = batch shape."""
    return {k: F.select(cond, p[k], q[k]) for k in ("x", "y", "z")}


def scalar_mul_bits(p: dict, bits: jnp.ndarray) -> dict:
    """Per-point scalar mult: bits (..., nbits) u32 in {0,1} (little-endian),
    batch-aligned with p. Double-and-add from the top bit."""
    nbits = bits.shape[-1]

    def body(i, acc):
        acc = ec_double(acc)
        bit = bits[..., nbits - 1 - i]
        return ec_select(bit == 1, ec_add(acc, p), acc)

    acc = identity_point(p["z"].shape[:-1])
    return jax.lax.fori_loop(0, nbits, body, acc)


def scalars_to_bits(scalars_canonical: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """(..., L) canonical 16-bit limbs -> (..., nbits) bit array."""
    limb = scalars_canonical[..., : (nbits + 15) // 16]
    shifts = jnp.arange(16, dtype=jnp.uint32)
    bits = (limb[..., :, None] >> shifts[None, :]) & 1
    return bits.reshape(bits.shape[:-2] + (-1,))[..., :nbits]


def tree_reduce_add(pts: dict) -> dict:
    """Reduce (n, ...) point batch to a single point with a pairwise add tree."""
    n = pts["x"].shape[0]
    while n > 1:
        if n % 2 == 1:
            idp = identity_point((1,) + pts["x"].shape[1:-1])
            pts = {k: jnp.concatenate([v, idp[k]], axis=0) for k, v in pts.items()}
            n += 1
        lo = {k: v[0::2] for k, v in pts.items()}
        hi = {k: v[1::2] for k, v in pts.items()}
        pts = ec_add(lo, hi)
        n = pts["x"].shape[0]
    return {k: v[0] for k, v in pts.items()}


# ---------------------------------------------------------------------------
# MSM
# ---------------------------------------------------------------------------

def _window_bits(n: int) -> int:
    if n >= (1 << 13):
        return 16
    if n >= (1 << 6):
        return 8
    return 4


@functools.partial(jax.jit, static_argnums=(2,))
def _msm_impl(points: dict, scalars_canonical: jnp.ndarray, c: int) -> dict:
    """points: (n,) dict; scalars: (n, L) canonical limbs; c-bit windows
    (c divides 16). Returns a single Jacobian point.

    The window loop is a `fori_loop` so the (large) per-window graph —
    sort, associative prefix-scan of ec_add, bucket scatter/fill — is
    compiled exactly once.
    """
    num_windows = Fr.num_limbs * (16 // c)
    nbuckets = 1 << c
    per_limb = 16 // c
    mask = jnp.uint32(nbuckets - 1)

    def fill_combiner(a, b):
        # reverse scan: propagate the nearest PRESENT bucket from above
        pt_a, fl_a = a
        pt_b, fl_b = b
        pt = ec_select(fl_b == 1, pt_b, pt_a)
        return pt, jnp.maximum(fl_a, fl_b)

    def window_total(w):
        limb = jnp.take(scalars_canonical, w // per_limb, axis=-1)
        digits = (limb >> (jnp.uint32(c) * (w % per_limb).astype(jnp.uint32))) & mask
        order = jnp.argsort(-digits.astype(jnp.int32))
        d_sorted = jnp.take(digits, order)
        pts_sorted = {k: jnp.take(v, order, axis=0) for k, v in points.items()}
        # inclusive prefix sums: A at the LAST row of bucket v equals the
        # suffix-bucket-sum T_v = sum_{b >= v} S_b.
        prefix = jax.lax.associative_scan(ec_add, pts_sorted, axis=0)
        d_next = jnp.concatenate([d_sorted[1:], jnp.zeros((1,), jnp.uint32)])
        is_boundary = d_sorted != d_next
        scatter_idx = jnp.where(is_boundary, d_sorted, jnp.uint32(nbuckets))
        bucket = identity_point((nbuckets,))
        bucket = {
            k: bucket[k].at[scatter_idx].set(prefix[k], mode="drop")
            for k in ("x", "y", "z")
        }
        flags = (
            jnp.zeros((nbuckets,), jnp.uint32)
            .at[scatter_idx]
            .set(jnp.ones_like(scatter_idx), mode="drop")
        )
        # fill empty buckets with the nearest present T from ABOVE, so that
        #   sum_b b*S_b = sum_{v=1..B} T_v   (sum of suffix sums).
        filled, _ = jax.lax.associative_scan(
            fill_combiner, (bucket, flags), axis=0, reverse=True
        )
        # sum over buckets 1..B-1 via one more prefix scan (keeps the graph
        # to a single scan instantiation instead of a log-depth unrolled tree)
        sums = jax.lax.associative_scan(ec_add, filled, axis=0)
        last = {k: v[-1] for k, v in sums.items()}
        return ec_add(last, ec_neg({k: v[0] for k, v in filled.items()}))

    def body(i, total):
        w = num_windows - 1 - i
        total = jax.lax.fori_loop(0, c, lambda _, t: ec_double(t), total)
        return ec_add(total, window_total(w))

    return jax.lax.fori_loop(0, num_windows, body, identity_point(()))


def variable_base_msm(points: dict, scalars_mont: jnp.ndarray) -> dict:
    """MSM over (n,) points with (n, L) Montgomery scalars. Returns a single
    Jacobian point (device). Semantics of msm.rs:84 variable_base_msm.

    Inputs are padded (identity points / zero scalars) to the next power of
    two (>= 16) so the expensive scan-kernel compiles are shared across the
    many MSM sizes a prover emits (quotients of every size, commits, ...).
    """
    n = scalars_mont.shape[0]
    target = max(16, 1 << (n - 1).bit_length()) if n > 1 else 16
    if target != n:
        pad = target - n
        idp = identity_point((pad,))
        points = {k: jnp.concatenate([v, idp[k]]) for k, v in points.items()}
        scalars_mont = jnp.concatenate(
            [scalars_mont, jnp.zeros((pad, scalars_mont.shape[1]), jnp.uint32)]
        )
    scal = F.from_mont(Fr, scalars_mont)
    return _msm_impl(points, scal, _window_bits(scal.shape[0]))


def msm_to_affine_int(points: dict, scalars_mont: jnp.ndarray) -> Tuple[int, int]:
    res = variable_base_msm(points, scalars_mont)
    out = jacobian_to_affine({k: v[None] for k, v in res.items()})
    return (int(out[0, 0]), int(out[0, 1]))


# ---------------------------------------------------------------------------
# fixed-base (SRS generation): vectorized double-and-add from one base point
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _fixed_base_msm_impl(base: dict, scalars_mont: jnp.ndarray, nbits: int) -> dict:
    scal = F.from_mont(Fr, scalars_mont)
    bits = scalars_to_bits(scal, nbits)
    n = scal.shape[0]
    base_b = {k: jnp.broadcast_to(v, (n,) + v.shape) for k, v in base.items()}
    return scalar_mul_bits(base_b, bits)


def fixed_base_msm(base: dict, scalars_mont: jnp.ndarray, nbits: int = 256) -> dict:
    """[s_i] * base for each scalar; base is a single point dict, scalars (n, L)
    mont. Returns (n,) point batch. Semantics of msm.rs:67 fixed_base_msm.
    Scalar count is padded to a power of two (>= 64) for compile reuse."""
    n = scalars_mont.shape[0]
    target = max(64, 1 << (n - 1).bit_length()) if n > 1 else 64
    if target != n:
        scalars_mont = jnp.concatenate(
            [scalars_mont, jnp.zeros((target - n, scalars_mont.shape[1]), jnp.uint32)]
        )
    out = _fixed_base_msm_impl(base, scalars_mont, nbits)
    return {k: v[:n] for k, v in out.items()}


def g1_generator() -> dict:
    pt = affine_to_jacobian(np.array([list(G1_GEN)], dtype=object))
    return {k: v[0] for k, v in pt.items()}
