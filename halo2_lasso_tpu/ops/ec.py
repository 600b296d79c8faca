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
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fq, Fr, G1_GEN
from halo2_lasso_tpu.ops.field import FieldSpec

# A Jacobian point batch is a dict {"x","y","z"} of (..., L) u32 mont arrays.


def identity_point(shape=(), spec: FieldSpec = None) -> dict:
    spec = spec or Fq
    L = spec.num_limbs
    zero = jnp.zeros(shape + (L,), dtype=jnp.uint32)
    one = jnp.broadcast_to(spec.one, shape + (L,))
    return {"x": one, "y": one, "z": zero}


def affine_to_jacobian(pts_xy: np.ndarray, spec: FieldSpec = None) -> dict:
    """host (..., 2) object ints (canonical affine; (0,0) = identity) -> device dict."""
    spec = spec or Fq
    pts_xy = np.asarray(pts_xy, dtype=object)
    xs = pts_xy[..., 0]
    ys = pts_xy[..., 1]
    is_id = np.logical_and(xs == 0, ys == 0)
    x = spec.encode(np.where(is_id, 1, xs))
    y = spec.encode(np.where(is_id, 1, ys))
    z = spec.encode(np.where(is_id, 0, 1))
    return {"x": jnp.asarray(x), "y": jnp.asarray(y), "z": jnp.asarray(z)}


def jacobian_to_affine(pt: dict, spec: FieldSpec = None) -> np.ndarray:
    """device dict -> host (..., 2) object ints; identity -> (0, 0).
    Batch padded to a power of two (>= 16) for compile reuse."""
    spec = spec or Fq
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
    ax, ay = _to_affine_jit(flat, spec)
    xs = spec.decode(np.asarray(ax))[:n]
    ys = spec.decode(np.asarray(ay))[:n]
    zzero = np.asarray(F.is_zero(spec, flat["z"]))[:n]
    out = np.empty(xs.shape + (2,), dtype=object)
    out[..., 0] = np.where(zzero, 0, xs)
    out[..., 1] = np.where(zzero, 0, ys)
    return out.reshape(batch + (2,))


@functools.partial(jax.jit, static_argnums=(1,))
def _to_affine_jit(flat: dict, spec: FieldSpec = Fq):
    zinv = F.batch_inv(spec, flat["z"])
    zinv2 = F.mont_mul(spec, zinv, zinv)
    zinv3 = F.mont_mul(spec, zinv2, zinv)
    ax = F.mont_mul(spec, flat["x"], zinv2)
    ay = F.mont_mul(spec, flat["y"], zinv3)
    return ax, ay


def _mul_stack(s, pairs):
    """Independent field products evaluated as ONE stacked mont_mul call.

    The EC formulas below are written in dependency LEVELS: every level's
    products are mutually independent, so they stack along a new leading
    axis and run as a single (k, ..., L) multiplication. This cuts the
    number of mont_mul call sites per EC op ~3x — which is what governs
    jax trace/lower time and XLA:CPU per-op dispatch overhead, and gives
    XLA a single fat kernel to tile instead of many thin ones.
    """
    a = jnp.stack([jnp.broadcast_arrays(x, y)[0] for x, y in pairs])
    b = jnp.stack([jnp.broadcast_arrays(x, y)[1] for x, y in pairs])
    out = F.mont_mul(s, a, b)
    return [out[i] for i in range(len(pairs))]


def ec_double(p: dict, spec: FieldSpec = None) -> dict:
    """Jacobian doubling, a=0 (dbl-2009-l), with independent products stacked
    per dependency level (4 mont_mul calls). Identity is handled naturally
    (z=0)."""
    s = spec or Fq
    X1, Y1, Z1 = p["x"], p["y"], p["z"]
    A, B, Z3h = _mul_stack(s, [(X1, X1), (Y1, Y1), (F.add(s, Y1, Y1), Z1)])
    E = F.add(s, F.add(s, A, A), A)  # 3A
    C, t, Fv = _mul_stack(s, [(B, B), (F.add(s, X1, B), F.add(s, X1, B)), (E, E)])
    t = F.sub(s, t, A)
    t = F.sub(s, t, C)
    D = F.add(s, t, t)  # 2((X1+B)^2 - A - C)
    X3 = F.sub(s, Fv, F.add(s, D, D))
    C8 = F.add(s, F.add(s, C, C), F.add(s, C, C))
    C8 = F.add(s, C8, C8)
    (Y3h,) = _mul_stack(s, [(E, F.sub(s, D, X3))])
    Y3 = F.sub(s, Y3h, C8)
    return {"x": X3, "y": Y3, "z": Z3h}


def ec_add(p: dict, q: dict, spec: FieldSpec = None) -> dict:
    """Branchless general Jacobian addition (add-2007-bl) with full special-
    case handling (p=O, q=O, p==q double, p==-q identity), products stacked
    per dependency level (6 mont_mul calls incl. the fused double)."""
    s = spec or Fq
    X1, X2 = jnp.broadcast_arrays(p["x"], q["x"])
    Y1, Y2 = jnp.broadcast_arrays(p["y"], q["y"])
    Z1, Z2 = jnp.broadcast_arrays(p["z"], q["z"])
    p = {"x": X1, "y": Y1, "z": Z1}
    q = {"x": X2, "y": Y2, "z": Z2}
    Z1Z1, Z2Z2, A2, B2, ZZ12 = _mul_stack(
        s, [(Z1, Z1), (Z2, Z2), (X1, X1), (Y1, Y1), (Z1, Z2)]
    )
    # doubled(p) interleaved: A2 = X1^2, B2 = Y1^2 computed above
    E2 = F.add(s, F.add(s, A2, A2), A2)
    U1, U2, T1, T2, C2, Td2, Fv2, Zd3 = _mul_stack(
        s,
        [
            (X1, Z2Z2),
            (X2, Z1Z1),
            (Y1, Z2),
            (Y2, Z1),
            (B2, B2),
            (F.add(s, X1, B2), F.add(s, X1, B2)),
            (E2, E2),
            (F.add(s, Y1, Y1), Z1),
        ],
    )
    S1, S2 = _mul_stack(s, [(T1, Z2Z2), (T2, Z1Z1)])
    H = F.sub(s, U2, U1)
    Rr = F.sub(s, S2, S1)

    # double tail (shares no muls with the add tail below)
    td = F.sub(s, F.sub(s, Td2, A2), C2)
    Dd = F.add(s, td, td)
    Xd3 = F.sub(s, Fv2, F.add(s, Dd, Dd))
    C8 = F.add(s, F.add(s, C2, C2), F.add(s, C2, C2))
    C8 = F.add(s, C8, C8)

    HH, RR = _mul_stack(s, [(H, H), (Rr, Rr)])
    HHH, V, Z3, Yd3h = _mul_stack(
        s, [(HH, H), (U1, HH), (ZZ12, H), (E2, F.sub(s, Dd, Xd3))]
    )
    Yd3 = F.sub(s, Yd3h, C8)
    X3 = F.sub(s, F.sub(s, RR, HHH), F.add(s, V, V))
    Y3h, S1HHH = _mul_stack(s, [(Rr, F.sub(s, V, X3)), (S1, HHH)])
    Y3 = F.sub(s, Y3h, S1HHH)
    added = {"x": X3, "y": Y3, "z": Z3}

    doubled = {"x": Xd3, "y": Yd3, "z": Zd3}

    p_is_id = F.is_zero(s, Z1)
    q_is_id = F.is_zero(s, Z2)
    h_zero = F.is_zero(s, H)
    r_zero = F.is_zero(s, Rr)
    both = jnp.logical_and(jnp.logical_not(p_is_id), jnp.logical_not(q_is_id))
    use_double = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    use_identity = jnp.logical_and(both, jnp.logical_and(h_zero, jnp.logical_not(r_zero)))

    idp = identity_point(Z1.shape[:-1], s)
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


def ec_neg(p: dict, spec: FieldSpec = None) -> dict:
    return {"x": p["x"], "y": F.neg(spec or Fq, p["y"]), "z": p["z"]}


def ec_select(cond, p: dict, q: dict) -> dict:
    """where(cond, p, q) — cond shape = batch shape."""
    return {k: F.select(cond, p[k], q[k]) for k in ("x", "y", "z")}


def scalar_mul_bits(p: dict, bits: jnp.ndarray, spec: FieldSpec = None) -> dict:
    """Per-point scalar mult: bits (..., nbits) u32 in {0,1} (little-endian),
    batch-aligned with p. Double-and-add from the top bit."""
    spec = spec or Fq
    nbits = bits.shape[-1]

    def body(i, acc):
        acc = ec_double(acc, spec)
        bit = bits[..., nbits - 1 - i]
        return ec_select(bit == 1, ec_add(acc, p, spec), acc)

    acc = identity_point(p["z"].shape[:-1], spec)
    return jax.lax.fori_loop(0, nbits, body, acc)


def scalars_to_bits(scalars_canonical: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """(..., L) canonical 16-bit limbs -> (..., nbits) bit array."""
    limb = scalars_canonical[..., : (nbits + 15) // 16]
    shifts = jnp.arange(16, dtype=jnp.uint32)
    bits = (limb[..., :, None] >> shifts[None, :]) & 1
    return bits.reshape(bits.shape[:-2] + (-1,))[..., :nbits]


def tree_reduce_add(pts: dict, spec: FieldSpec = None) -> dict:
    """Reduce (n, ...) point batch to a single point with a pairwise add tree."""
    spec = spec or Fq
    n = pts["x"].shape[0]
    while n > 1:
        if n % 2 == 1:
            idp = identity_point((1,) + pts["x"].shape[1:-1], spec)
            pts = {k: jnp.concatenate([v, idp[k]], axis=0) for k, v in pts.items()}
            n += 1
        lo = {k: v[0::2] for k, v in pts.items()}
        hi = {k: v[1::2] for k, v in pts.items()}
        pts = ec_add(lo, hi, spec)
        n = pts["x"].shape[0]
    return {k: v[0] for k, v in pts.items()}


# ---------------------------------------------------------------------------
# MSM
# ---------------------------------------------------------------------------

# Below this many points the batched double-and-add path wins: its XLA graph
# is one fori_loop body (double + select-add) vs the Pippenger module's
# per-window sort + three associative scans, whose trace/lower cost alone
# (~5s/shape on this jaxlib) dwarfs any tiny MSM's runtime. Provers emit
# MANY tiny MSMs (per-quotient commits, test-sized circuits), so this path
# is what keeps small proofs fast end to end.
SMALL_MSM_MAX = 1 << 9


def _window_bits(n: int) -> int:
    if n >= (1 << 13):
        return 16
    return 8


def _tree_reduce_axis1(pts: dict, spec: FieldSpec = None) -> dict:
    """Reduce a (B, n) point batch over axis 1 (n a power of two)."""
    spec = spec or Fq
    n = pts["x"].shape[1]
    while n > 1:
        lo = {k: v[:, 0::2] for k, v in pts.items()}
        hi = {k: v[:, 1::2] for k, v in pts.items()}
        pts = ec_add(lo, hi, spec)
        n = pts["x"].shape[1]
    return {k: v[:, 0] for k, v in pts.items()}


@functools.partial(jax.jit, static_argnums=(2, 3))
def _scalar_mul_lanes(
    points: dict, scalars_canonical: jnp.ndarray, nbits: int, spec: FieldSpec = Fq
) -> dict:
    """(M,) points x (M, L) canonical scalars -> (M,) per-lane s_i * P_i.

    One flat lane axis on purpose: every small MSM (any B x n batch) is
    flattened and padded to a canonical M before this call, so the
    double-and-add module is traced/compiled once per M per process —
    shape churn, not runtime, is what made small MSMs slow.
    """
    bits = scalars_to_bits(scalars_canonical, nbits)
    return scalar_mul_bits(points, bits, spec)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _row_sum(pts_flat: dict, B: int, n: int, spec: FieldSpec = Fq) -> dict:
    """(B*n,) flat point batch -> (B,) row sums.

    Sequential fori accumulation (one ec_add body traced per B) beats a
    log-depth tree here: the tree re-traces log(n) distinctly-shaped
    levels per (B, n) combination, and n is small on this path."""
    pts = {k: v.reshape((B, n) + v.shape[1:]) for k, v in pts_flat.items()}

    def body(i, acc):
        return ec_add(acc, {k: v[:, i] for k, v in pts.items()}, spec)

    return jax.lax.fori_loop(0, n, body, identity_point((B,), spec))


def _msm_small(
    points: dict,
    scalars_canonical: jnp.ndarray,
    spec: FieldSpec = None,
    nbits: int = None,
) -> dict:
    """points: (n,) dict; scalars: (B, n, L) canonical limbs -> (B,) points."""
    spec = spec or Fq
    nbits = nbits or Fr.num_bits
    B, n, L = scalars_canonical.shape
    Bp = 1 << (B - 1).bit_length() if B > 1 else 1  # canonical row counts
    if Bp != B:
        scalars_canonical = jnp.concatenate(
            [scalars_canonical, jnp.zeros((Bp - B, n, L), jnp.uint32)]
        )
    M = max(64, Bp * n)
    pts_flat = {
        k: jnp.broadcast_to(v, (Bp,) + v.shape).reshape((Bp * n,) + v.shape[1:])
        for k, v in points.items()
    }
    scal_flat = scalars_canonical.reshape(Bp * n, L)
    if M != Bp * n:
        pad = M - Bp * n
        idp = identity_point((pad,), spec)
        pts_flat = {k: jnp.concatenate([v, idp[k]]) for k, v in pts_flat.items()}
        scal_flat = jnp.concatenate([scal_flat, jnp.zeros((pad, L), jnp.uint32)])
    per_lane = _scalar_mul_lanes(pts_flat, scal_flat, nbits, spec)
    if M != Bp * n:
        per_lane = {k: v[: Bp * n] for k, v in per_lane.items()}
    out = _row_sum(per_lane, Bp, n, spec)
    return {k: v[:B] for k, v in out.items()}


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


def _pad_msm_inputs(
    points: dict, scalars_mont: jnp.ndarray, min_n: int = 16, spec: FieldSpec = None
):
    n = scalars_mont.shape[0]
    target = max(min_n, 1 << (n - 1).bit_length()) if n > 1 else min_n
    if target != n:
        pad = target - n
        idp = identity_point((pad,), spec or Fq)
        points = {k: jnp.concatenate([v, idp[k]]) for k, v in points.items()}
        scalars_mont = jnp.concatenate(
            [scalars_mont, jnp.zeros((pad, scalars_mont.shape[1]), jnp.uint32)]
        )
    return points, scalars_mont


def variable_base_msm(
    points: dict,
    scalars_mont: jnp.ndarray,
    base: FieldSpec = None,
    scalar: FieldSpec = None,
) -> dict:
    """MSM over (n,) points with (n, L) Montgomery scalars. Returns a single
    Jacobian point (device). Semantics of msm.rs:84 variable_base_msm.
    `base`/`scalar` select the curve (default BN254 G1; grumpkin = Fr/Fq).

    Inputs are padded (identity points / zero scalars) to the next power of
    two (>= 16) so the expensive scan-kernel compiles are shared across the
    many MSM sizes a prover emits (quotients of every size, commits, ...).
    """
    base = base or Fq
    scalar = scalar or Fr
    points, scalars_mont = _pad_msm_inputs(points, scalars_mont, spec=base)
    n = scalars_mont.shape[0]
    mesh = _active_mesh() if base is Fq else None
    if mesh is not None and n >= 2 * mesh.size and n > SMALL_MSM_MAX:
        # shard the point set over the mesh: per-shard Pippenger totals,
        # all_gather (3 coords each), local tree add (parallel/sharding.py)
        from halo2_lasso_tpu.parallel import sharding as shd

        pts_sh = {k: shd.shard_evals(mesh, v) for k, v in points.items()}
        scal_sh = shd.shard_evals(mesh, scalars_mont)
        fn = shd.sharded_msm_cached(mesh, _window_bits(n // mesh.size))
        return fn(pts_sh, scal_sh)
    if n > SMALL_MSM_MAX:
        # pure-Jacobian halving MSM (ops/msm_jacobian.py), BOTH platforms:
        # scan-free complete-add levels (no batch-inversion latency walls),
        # bit-plane bucket tree + host power-of-two recombination. The
        # batched-affine variant (ops/msm_affine.py) spends ~2.3x fewer muls
        # but its chunked-inversion scans and sequential bucket epilogue are
        # latency-bound on the TPU (measured 812ms -> ~90ms at 2^16).
        # HALO2_LASSO_TPU_MSM=affine switches back for comparison benches.
        import os as _os

        if _os.environ.get("HALO2_LASSO_TPU_MSM") == "affine":
            from halo2_lasso_tpu.ops import msm_affine

            return msm_affine.msm_affine(
                points, scalars_mont, base=base, scalar=scalar
            )
        from halo2_lasso_tpu.ops import msm_jacobian

        return msm_jacobian.msm(points, scalars_mont, base=base, scalar=scalar)
    scal = F.from_mont(scalar, scalars_mont)
    out = _msm_small(points, scal[None], base, scalar.num_bits)
    return {k: v[0] for k, v in out.items()}


def _active_mesh():
    from halo2_lasso_tpu.parallel import sharding as shd

    return shd.active_mesh()


def _pallas_msm_enabled() -> bool:
    import os

    if os.environ.get("HALO2_LASSO_TPU_PALLAS", "1") == "0":
        return False
    return jax.devices()[0].platform != "cpu"


def batch_msm(
    points: dict,
    scalars_mont: jnp.ndarray,
    base: FieldSpec = None,
    scalar: FieldSpec = None,
) -> np.ndarray:
    """B MSMs sharing one point set: scalars (B, n, L) Montgomery ->
    host (B, 2) affine object ints. Small sizes run as ONE vectorized
    double-and-add over all B*n lanes (the batch_commit hot path)."""
    base = base or Fq
    scalar = scalar or Fr
    B, n = scalars_mont.shape[:2]
    if B == 0:
        return np.empty((0, 2), dtype=object)
    target = max(16, 1 << (n - 1).bit_length()) if n > 1 else 16
    if target != n:
        pad = target - n
        idp = identity_point((pad,), base)
        points = {k: jnp.concatenate([v, idp[k]]) for k, v in points.items()}
        scalars_mont = jnp.concatenate(
            [
                scalars_mont,
                jnp.zeros((B, pad, scalars_mont.shape[2]), jnp.uint32),
            ],
            axis=1,
        )
    if target <= SMALL_MSM_MAX:
        scal = F.from_mont(scalar, scalars_mont)
        res = _msm_small(points, scal, base, scalar.num_bits)
        return jacobian_to_affine(res, base)
    mesh = _active_mesh() if base is Fq else None
    if mesh is not None and target >= 2 * mesh.size:
        from halo2_lasso_tpu.parallel import sharding as shd

        pts_sh = {k: shd.shard_evals(mesh, v) for k, v in points.items()}
        fn = shd.sharded_msm_cached(mesh, _window_bits(target // mesh.size))
        outs = [fn(pts_sh, shd.shard_evals(mesh, scalars_mont[i])) for i in range(B)]
        stacked = {k: jnp.stack([o[k] for o in outs]) for k in ("x", "y", "z")}
        return jacobian_to_affine(stacked, base)
    # all B device pipelines dispatch async; ONE stacked host pull + host
    # recombination/affine (a per-MSM pull costs one tunnel RTT each)
    from halo2_lasso_tpu.ops import msm_jacobian

    return msm_jacobian.msm_many_affine(points, scalars_mont, base, scalar)


def msm_to_affine_int(
    points: dict,
    scalars_mont: jnp.ndarray,
    base: FieldSpec = None,
    scalar: FieldSpec = None,
) -> Tuple[int, int]:
    res = variable_base_msm(points, scalars_mont, base, scalar)
    out = jacobian_to_affine({k: v[None] for k, v in res.items()}, base or Fq)
    return (int(out[0, 0]), int(out[0, 1]))


def msm_list_to_affine_int(
    jobs: List[Tuple[dict, jnp.ndarray]],
    base: FieldSpec = None,
    scalar: FieldSpec = None,
) -> List[Tuple[int, int]]:
    """A LIST of independent MSMs (mixed sizes, distinct point sets — the
    KZG quotient-commit shape) with every device pipeline dispatched async
    and at most TWO device->host pulls total (one for the large-MSM partial
    stacks, one for the small-MSM points). A per-MSM pull costs a full
    tunnel round-trip, which dominated the prover's open phase."""
    base = base or Fq
    scalar = scalar or Fr
    mesh = _active_mesh() if base is Fq else None
    if mesh is not None:
        # sharded path: keep the per-job replicated results (virtual-device
        # meshes are host-local; the RTT concern doesn't apply)
        return [msm_to_affine_int(p, s, base, scalar) for p, s in jobs]

    from halo2_lasso_tpu.ops import msm_jacobian as MJ

    large_jobs = []  # (idx, points, scal, n)
    small_pts, small_idx = [], []
    for idx, (points, scal) in enumerate(jobs):
        points, scal = _pad_msm_inputs(points, scal, spec=base)
        n = scal.shape[0]
        if n > SMALL_MSM_MAX:
            large_jobs.append((idx, points, scal, n))
        else:
            sc = F.from_mont(scalar, scal)
            res = _msm_small(points, sc[None], base, scalar.num_bits)
            small_pts.append(
                jnp.concatenate([res["x"][0], res["y"][0], res["z"][0]])
            )
            small_idx.append(idx)

    # group mixed-size large jobs into SEGMENTED pipelines (each group padded
    # to its largest member and run as S*W windows of one device pipeline,
    # MJ._device_partials_seg): the KZG quotient open emits one MSM per
    # variable (16 sizes at nv=16) and per-pipeline fixed cost — not point
    # count — dominated the prover's open phase (measured 3.25s/open with
    # one pipeline per size). Lane budget caps group HBM; jobs too big to
    # group fall back to the sliced single-MSM path.
    # DEFAULT OFF: the W'=S*W level modules are fresh XLA shapes; on the
    # axon TPU stack a S=4/W'=104 group took ~22min to compile and then
    # crashed remote_compile (response truncated). Until the compile cost
    # is survivable, grouping is opt-in for experiments.
    LANE_BUDGET = int(os.environ.get("HALO2_LASSO_TPU_MSM_GROUP_LANES", "0"))
    large_jobs.sort(key=lambda t: -t[3])
    seg_groups: List[List] = []
    singles: List = []
    for job in large_jobs:
        n = job[3]
        w_est = -(-scalar.num_bits // 10)
        if n > MJ._MSM_SLICE or w_est * n > LANE_BUDGET:
            singles.append(job)
            continue
        placed = False
        for g in seg_groups:
            n_pad = g[0][3]  # groups sorted: first member is the largest
            if w_est * n_pad * (len(g) + 1) <= LANE_BUDGET:
                g.append(job)
                placed = True
                break
        if not placed:
            seg_groups.append([job])
    # a 1-element "group" is just the plain pipeline
    singles.extend(g[0] for g in seg_groups if len(g) == 1)
    seg_groups = [g for g in seg_groups if len(g) > 1]

    parts = []  # (kind, payload, meta)
    for g in seg_groups:
        n_pad = g[0][3]
        tcat, c, W = MJ._device_partials_seg(
            [(p, s) for _, p, s, _ in g], base, scalar, n_pad
        )
        parts.append(("seg", tcat, (c, W, [idx for idx, *_ in g])))
    for idx, points, scal, n in singles:
        positions = []
        for off in range(0, n, MJ._MSM_SLICE):
            tcat, c, W = MJ._device_partials(
                {k: v[off : off + MJ._MSM_SLICE] for k, v in points.items()},
                scal[off : off + MJ._MSM_SLICE],
                base,
                scalar,
            )
            parts.append(("single_part", tcat, None))
            positions.append(len(parts) - 1)
        parts[positions[0]] = ("single", parts[positions[0]][1], (c, W, idx, positions))

    totals: List = [None] * len(jobs)
    if parts:
        # pull every pipeline's partials (shapes differ across groups)
        raws = [np.asarray(t) for _, t, _ in parts]  # device->host
        for pos, (kind, _, meta) in enumerate(parts):
            if kind == "seg":
                c, W, idxs = meta
                all_u = base.decode(raws[pos].T)
                segs = MJ._finish_host_segments(all_u, c, W, len(idxs), base.modulus)
                for idx, t in zip(idxs, segs):
                    totals[idx] = t
            elif kind == "single":
                c, W, idx, positions = meta
                total = (0, 0, 0)
                for ppos in positions:
                    all_u = base.decode(raws[ppos].T)
                    total = MJ._host_jac_add(
                        total,
                        MJ._finish_host(all_u, c, W, base.modulus),
                        base.modulus,
                    )
                totals[idx] = total
    if small_pts:
        L = base.num_limbs
        raw = np.asarray(jnp.stack(small_pts))  # one pull, (S, 3L)
        sm = base.decode(raw.reshape(-1, 3, L))
        for pos, idx in enumerate(small_idx):
            row = sm[pos]
            totals[idx] = (int(row[0]), int(row[1]), int(row[2]))
    aff = MJ._host_batch_affine(totals, base.modulus)
    return [(int(x), int(y)) for x, y in aff]


# ---------------------------------------------------------------------------
# fixed-base (SRS generation): vectorized double-and-add from one base point
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _fixed_base_msm_impl(
    base: dict,
    scalars_mont: jnp.ndarray,
    nbits: int,
    bspec: FieldSpec = Fq,
    sspec: FieldSpec = Fr,
) -> dict:
    scal = F.from_mont(sspec, scalars_mont)
    bits = scalars_to_bits(scal, nbits)
    n = scal.shape[0]
    base_b = {k: jnp.broadcast_to(v, (n,) + v.shape) for k, v in base.items()}
    return scalar_mul_bits(base_b, bits, bspec)


def fixed_base_msm(
    base: dict,
    scalars_mont: jnp.ndarray,
    nbits: int = 256,
    bspec: FieldSpec = None,
    sspec: FieldSpec = None,
) -> dict:
    """[s_i] * base for each scalar; base is a single point dict, scalars (n, L)
    mont. Returns (n,) point batch. Semantics of msm.rs:67 fixed_base_msm.
    Scalar count is padded to a power of two (>= 64) for compile reuse."""
    bspec = bspec or Fq
    sspec = sspec or Fr
    n = scalars_mont.shape[0]
    target = max(64, 1 << (n - 1).bit_length()) if n > 1 else 64
    if target != n:
        scalars_mont = jnp.concatenate(
            [scalars_mont, jnp.zeros((target - n, scalars_mont.shape[1]), jnp.uint32)]
        )
    # windowed per-base table (msm.rs:16-65): W gathers + log-depth tree per
    # point instead of nbits sequential double/adds. Falls back to the
    # ladder for an identity base (no affine form).
    aff = jacobian_to_affine({k: v[None] for k, v in base.items()}, bspec)
    bx, by = int(aff[0, 0]), int(aff[0, 1])
    if (bx, by) != (0, 0):
        from halo2_lasso_tpu.ops import msm_jacobian

        # the windowed gather materializes (L, Wp*n) per coordinate; at
        # 2^20+ scalars that is tens of GB — process bounded slices (the
        # per-slice shapes are shared, so compiles are reused)
        W = -(-nbits // 8)
        Wp = 1 << (W - 1).bit_length()
        limit = max(64, (1 << 23) // Wp)
        if scalars_mont.shape[0] > limit:
            parts = [
                msm_jacobian.fixed_base_msm_windowed(
                    (bx, by), scalars_mont[off : off + limit], nbits, bspec, sspec
                )
                for off in range(0, scalars_mont.shape[0], limit)
            ]
            out = {
                k: jnp.concatenate([pt[k] for pt in parts]) for k in parts[0]
            }
        else:
            out = msm_jacobian.fixed_base_msm_windowed(
                (bx, by), scalars_mont, nbits, bspec, sspec
            )
    else:
        out = _fixed_base_msm_impl(base, scalars_mont, nbits, bspec, sspec)
    return {k: v[:n] for k, v in out.items()}


def g1_generator() -> dict:
    pt = affine_to_jacobian(np.array([list(G1_GEN)], dtype=object))
    return {k: v[0] for k, v in pt.items()}


def curve_generator(curve) -> dict:
    """Generator of a CurveSpec (ops/curves.py) as a device point dict."""
    pt = affine_to_jacobian(
        np.array([list(curve.generator)], dtype=object), curve.base
    )
    return {k: v[0] for k, v in pt.items()}
