"""Batched-affine Pippenger MSM (window-batched halving), TPU-native.

Replaces the double-prefix-scan MSM (ops/pallas_ec.py round-2 stage A) with
the GPU-style batched-affine bucket accumulation, redesigned for XLA/TPU
regularity (semantics of /root/reference/plonkish_backend/src/util/
arithmetic/msm.rs:84-181):

  * all W windows' digits are extracted up front and processed TOGETHER
    (one (W, n) batch), so every level of the halving tree issues ONE
    batch inversion for every window at once (16 Fermat inversions total,
    not 16 per window);
  * per window the points are sorted by digit (desc). Each level pairs
    adjacent slots: equal digits -> batched AFFINE add (lambda = num/den
    with the denominators inverted by a single log-depth batch inversion;
    ~6 muls/lane vs ~27 for a general Jacobian add), unequal digits ->
    the left slot is the END of its digit run (sorted order is preserved
    by halving) and is FLUSHED into its bucket with a conflict-free
    scatter (<= one flush per digit per level);
  * bucket tables finish with the standard suffix-scan weighted sum
    (sum_b b*S_b = sum_v T_v), batched over windows, on the Jacobian
    pallas combiner; window totals combine by Horner with c doublings.

State is limbs-first (L, lanes) throughout so the elementwise field ops ride
the tile-aligned Pallas kernels (ops/pallas_field.py v2 layout); on CPU the
same code falls back to the portable jnp ops, which keeps the algorithm under
the regular (virtual-device) test suite.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import ec as jec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.ops.field import LIMB_BITS

L = Fq.num_limbs
LANE = 128
_PALLAS_MIN = 256


def _on_accel() -> bool:
    return jax.devices()[0].platform != "cpu"


# ---------------------------------------------------------------------------
# limbs-first elementwise field ops with pallas dispatch
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pallas_mul(n: int, spec=Fq):
    from halo2_lasso_tpu.ops import pallas_field as PF

    mul3 = PF.make_mont_mul(spec)

    @jax.jit
    def f(a, b):
        S = n // LANE
        return mul3(a.reshape(L, S, LANE), b.reshape(L, S, LANE)).reshape(L, n)

    return f


def mul_lf_traced(a: jnp.ndarray, b: jnp.ndarray, spec=Fq) -> jnp.ndarray:
    """(L, X) elementwise Montgomery product traced at the XLA level
    (pallas_field._mul_rows on limb-row slices — no transposes). Used inside
    the batch-inversion scans: their slice shapes halve every scan level, and
    a pallas kernel per distinct shape means hundreds of Mosaic compiles per
    MSM size; one fused XLA module compiles once."""
    from halo2_lasso_tpu.ops.pallas_field import _mul_rows

    return jnp.stack(
        _mul_rows(spec, [a[i] for i in range(L)], [b[i] for i in range(L)]), axis=0
    )


def mul_lf(a: jnp.ndarray, b: jnp.ndarray, spec=Fq) -> jnp.ndarray:
    """(L, X) elementwise Montgomery product: pallas tile kernel on the
    accelerator (full-shape call sites only), XLA-traced rows otherwise.
    The pallas grid requires the sublane-row count S = X/128 to be covered
    exactly (tile = min(TILE_S, S), grid = S//tile silently DROPS remainder
    rows), so only dispatch when S <= TILE_S or TILE_S | S."""
    n = a.shape[1]
    if _on_accel() and n % LANE == 0 and n >= _PALLAS_MIN:
        from halo2_lasso_tpu.ops.pallas_field import TILE_S

        S = n // LANE
        if S <= TILE_S or S % TILE_S == 0:
            return _pallas_mul(n, spec)(a, b)
    return mul_lf_traced(a, b, spec)


def add_lf(a, b, spec=Fq):
    from halo2_lasso_tpu.ops.pallas_field import _add_rows

    return jnp.stack(
        _add_rows(spec, [a[i] for i in range(L)], [b[i] for i in range(L)]), axis=0
    )


def sub_lf(a, b, spec=Fq):
    from halo2_lasso_tpu.ops.pallas_field import _sub_rows

    return jnp.stack(
        _sub_rows(spec, [a[i] for i in range(L)], [b[i] for i in range(L)]), axis=0
    )


def _iszero_lf(a):
    """(L, X) -> (X,) bool."""
    return jnp.sum(a.astype(jnp.int32), axis=0) == 0


def _one_lf(n, spec=Fq):
    return jnp.broadcast_to(
        jnp.asarray(np.asarray(spec.r_limbs, np.uint32))[:, None], (L, n)
    )


def batch_inv_lf(a: jnp.ndarray, spec=Fq) -> jnp.ndarray:
    """(L, X) batched modular inverse (zeros -> zeros).

    Accelerator: chunked Montgomery trick — lax.scan prefix/suffix products
    over T sequential steps of X/T lanes each (work-optimal ~3 muls/element,
    and the scan body is traced ONCE so level modules stay small; the
    earlier log-depth associative scans unrolled into giant modules that
    took this jaxlib tens of minutes to compile at 2^16 MSM sizes). CPU:
    the fully sequential Montgomery trick under lax.scan."""
    n = a.shape[1]
    zero = _iszero_lf(a)
    aa = jnp.where(zero[None, :], _one_lf(n, spec), a)
    if not _on_accel():
        inv = _batch_inv_seq(spec)(aa)
        return jnp.where(zero[None, :], jnp.zeros_like(inv), inv)
    inv = _batch_inv_lanes(aa, spec)
    return jnp.where(zero[None, :], jnp.zeros_like(inv), inv)


def _batch_inv_lanes(aa: jnp.ndarray, spec=Fq) -> jnp.ndarray:
    """(L, m) batched inverse of nonzero elements, platform-agnostic math.

    Chunked Montgomery trick with FIXED chunk widths: pad m up to T*G
    (pads are ones), sequential-scan the prefix/suffix products across T
    steps of G lanes, recurse on the G chunk totals, terminate with a
    batch Fermat pow (fori-loop: tiny graph) at m <= 256.

    Compile-shape discipline is the point: this jaxlib's XLA:TPU backend
    takes ~20s PER inlined mont_mul graph instance, so unrolled
    associative scans (2*log m instances) took 200s+ per module. Here a
    module contains two lax.scan bodies (one mul each, traced once) whose
    operand shape is one of exactly two widths (4096 / 256) shared by
    every level of every MSM size — the mul kernel inside is reused, and
    the padding (< G ones per level) is noise."""
    m = aa.shape[1]
    if m <= _INV_FERMAT_MAX:
        return _inv_fermat_lf(aa, spec)
    G = 4096 if m > 16384 else 256
    T = -(-m // G)
    pad = T * G - m
    if pad:
        aa = jnp.concatenate([aa, _one_lf(pad, spec)], axis=1)
    mulc = functools.partial(mul_lf, spec=spec)
    xs = jnp.transpose(aa.reshape(L, T, G), (1, 0, 2))  # (T, L, G)

    def fwd(carry, x):
        return mulc(carry, x), carry  # emit EXCLUSIVE prefix product

    total, pre_exc = jax.lax.scan(fwd, _one_lf(G, spec), xs)
    tinv = _batch_inv_lanes(total, spec)

    def bwd(carry, x_pexc):
        x, pexc = x_pexc
        return mulc(carry, x), mulc(carry, pexc)

    _, invs = jax.lax.scan(bwd, tinv, (xs, pre_exc), reverse=True)
    return jnp.transpose(invs, (1, 0, 2)).reshape(L, T * G)[:, :m]


_INV_FERMAT_MAX = 256


def _inv_fermat_lf(aa: jnp.ndarray, spec=Fq) -> jnp.ndarray:
    """(L, m) Fermat inversion a^{p-2}, limbs-first square-and-multiply
    under a fori_loop (graph = 2 muls; ~2*254 sequential muls at runtime,
    fine at the <= 256-lane recursion terminal)."""
    e = spec.modulus - 2
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    )

    def body(i, state):
        result, base = state
        nr = mul_lf(result, base, spec)
        result = jnp.where(bits[i] == 1, nr, result)
        base = mul_lf(base, base, spec)
        return result, base

    one = _one_lf(aa.shape[1], spec)
    result, _ = jax.lax.fori_loop(0, nbits, body, (one, aa))
    return result


@functools.lru_cache(maxsize=None)
def _batch_inv_seq(spec):
    @jax.jit
    def f(aa):  # (L, X), no zeros
        aT = jnp.transpose(aa, (1, 0))  # (X, L)
        one = jnp.asarray(np.asarray(spec.r_limbs, np.uint32))

        def fwd(carry, x):
            new = F.mont_mul(spec, carry[None], x[None])[0]
            return new, carry  # emit EXCLUSIVE prefix product

        total, pre_exc = jax.lax.scan(fwd, one, aT)
        tinv = F.inv(spec, total[None])[0]

        def bwd(carry, xs):
            x, pexc = xs
            inv_i = F.mont_mul(spec, carry[None], pexc[None])[0]
            carry2 = F.mont_mul(spec, carry[None], x[None])[0]
            return carry2, inv_i

        _, invs = jax.lax.scan(bwd, tinv, (aT, pre_exc), reverse=True)
        return jnp.transpose(invs, (1, 0))

    return f


# ---------------------------------------------------------------------------
# the affine pair/flush level step
# ---------------------------------------------------------------------------


def _affine_add_with_inv(xa, ya, xb, yb, num, inv, spec=Fq):
    """lambda = num*inv; returns (x3, y3)."""
    lam = mul_lf(num, inv, spec)
    x3 = sub_lf(sub_lf(mul_lf(lam, lam, spec), xa, spec), xb, spec)
    y3 = sub_lf(mul_lf(lam, sub_lf(xa, x3, spec), spec), ya, spec)
    return x3, y3


def _eq_lf(a, b, spec=Fq):
    return _iszero_lf(sub_lf(a, b, spec))


def _level_step(ax, ay, inf, dig, bx, by, binf, B, W, spec=Fq):
    """One halving level. ax/ay: (L, m) per flattened (W, m/W) slot array
    (m = W * mw lanes), dig/inf: (m,). Returns halved state + updated
    buckets ((L, W*B), (W*B,)).

    Every lane performs at most ONE affine add: a same-digit pair combines
    (xa,ya)+(xb,yb), while a digit boundary flushes the run-end `a` into
    its bucket as (gx,gy)+(xa,ya) — the two cases are mutually exclusive,
    so they share one operand-selected add and one half-size inversion
    batch (vs two adds + a full-size batch when handled separately)."""
    m = ax.shape[1]
    half = m // 2
    # adjacent pairs: slots (2i, 2i+1) — contiguous, window-aligned because
    # every window's slot count is even until the final lane
    xa, xb = ax[:, 0::2], ax[:, 1::2]
    ya, yb = ay[:, 0::2], ay[:, 1::2]
    ia, ib = inf[0::2], inf[1::2]
    da, db = dig[0::2], dig[1::2]

    same = da == db
    a_fin = jnp.logical_not(ia)

    # flush lane prep: a flushed into bucket da when digits differ
    flush = jnp.logical_and(jnp.logical_not(same), a_fin)
    widx = jnp.arange(half, dtype=jnp.uint32) // jnp.uint32(half // W)
    bslot = jnp.where(flush, widx * jnp.uint32(B) + da, jnp.uint32(W * B))
    gx = jnp.take(bx, jnp.minimum(bslot, W * B - 1), axis=1)
    gy = jnp.take(by, jnp.minimum(bslot, W * B - 1), axis=1)
    ginf = jnp.take(binf, jnp.minimum(bslot, W * B - 1))

    # unified add operands: P + Q
    #   same  -> P = (xa, ya), Q = (xb, yb)   [pair combine]
    #   flush -> P = (gx, gy), Q = (xa, ya)   [bucket accumulate]
    sm = same[None, :]
    px = jnp.where(sm, xa, gx)
    py = jnp.where(sm, ya, gy)
    qx = jnp.where(sm, xb, xa)
    qy = jnp.where(sm, yb, ya)
    act = jnp.where(
        same,
        jnp.logical_and(a_fin, jnp.logical_not(ib)),
        jnp.logical_and(flush, jnp.logical_not(ginf)),
    )
    x_eq = jnp.logical_and(act, _eq_lf(px, qx, spec))
    y_eq = jnp.logical_and(x_eq, _eq_lf(py, qy, spec))
    dbl = y_eq
    cancel = jnp.logical_and(x_eq, jnp.logical_not(y_eq))
    gen = jnp.logical_and(act, jnp.logical_not(x_eq))
    comb = jnp.logical_or(gen, dbl)

    den = jnp.where(dbl[None, :], add_lf(py, py, spec), sub_lf(qx, px, spec))
    den = jnp.where(comb[None, :], den, _one_lf(half, spec))
    px2 = mul_lf(px, px, spec)
    num = jnp.where(
        dbl[None, :],
        add_lf(add_lf(px2, px2, spec), px2, spec),
        sub_lf(qy, py, spec),
    )
    inv = batch_inv_lf(den, spec)
    x3, y3 = _affine_add_with_inv(px, py, qx, qy, num, inv, spec)

    # survivors: same-digit pairs -> combined (or pass-through / cancel);
    # digit boundary -> b passes through untouched
    sx = jnp.where(comb[None, :], x3, jnp.where(ia[None, :], xb, xa))
    sy = jnp.where(comb[None, :], y3, jnp.where(ia[None, :], yb, ya))
    sx = jnp.where(sm, sx, xb)
    sy = jnp.where(sm, sy, yb)
    sinf = jnp.where(
        same,
        jnp.where(comb, False, jnp.where(cancel, True, jnp.logical_and(ia, ib))),
        ib,
    )
    sdig = db

    # bucket updates (flush lanes): bucket + a, a (bucket empty), or identity
    # on cancellation
    ux = jnp.where(comb[None, :], x3, xa)
    uy = jnp.where(comb[None, :], y3, ya)
    uinf = jnp.where(comb, False, jnp.where(cancel, True, ginf))
    ux = jnp.where(ginf[None, :], xa, ux)
    uy = jnp.where(ginf[None, :], ya, uy)
    uinf = jnp.where(jnp.logical_and(flush, ginf), False, uinf)

    bx = bx.at[:, bslot].set(ux, mode="drop")
    by = by.at[:, bslot].set(uy, mode="drop")
    binf = binf.at[bslot].set(uinf, mode="drop")
    return sx, sy, sinf, sdig, bx, by, binf


def _digits_all(scal: jnp.ndarray, c: int, num_windows: int) -> jnp.ndarray:
    """(n, L) canonical limbs -> (W, n) c-bit digits."""
    outs = []
    for w in range(num_windows):
        lo_bit = c * w
        lo_limb = lo_bit // LIMB_BITS
        off = lo_bit % LIMB_BITS
        val = scal[:, lo_limb] >> jnp.uint32(off)
        if off + c > LIMB_BITS and lo_limb + 1 < scal.shape[1]:
            val = val | (scal[:, lo_limb + 1] << jnp.uint32(LIMB_BITS - off))
        outs.append(val & jnp.uint32((1 << c) - 1))
    return jnp.stack(outs, axis=0)


def _best_c(n: int, nbits: int = 254) -> int:
    """Window size. A per-size optimum (minimize windows * (merged-add
    affine halving ~7 muls * n lanes + jacobian bucket scan ~54 muls *
    2^c)) varies by only ~15% across 2^12..2^20 — but every distinct c
    changes W and with it EVERY level-module shape, forcing a fresh
    ~3-minute XLA compile per level per MSM size. A PINNED c makes the
    level shapes of a size-n MSM exactly the tail of the size-2n MSM's
    (lanes = W * n / 2^j), so the prover's many mixed-size MSMs (commits,
    quotients at every size) share ONE compile set. Override for sweeps:
    HALO2_LASSO_TPU_MSM_C."""
    import os

    env = os.environ.get("HALO2_LASSO_TPU_MSM_C")
    if env:
        return int(env)
    return 10


def _weighted_sum_seq(seq: Dict, spec=Fq) -> Dict:
    """seq: batch-major point dict (K, Wl, L) -> (Wl, L): sum_k k * P_k.

    Sequential lax.scan over k = K-1 .. 1 carrying (accT, accR):
    accT = sum_{j>=k} P_j (suffix sum), accR accumulates the accTs, so the
    final accR = sum_{k>=1} suffix_k = sum_k k*P_k. The scan body is traced
    ONCE (2 ec_adds) — the earlier unrolled associative scans produced
    modules this jaxlib took tens of minutes to compile."""
    K, Wl = seq["x"].shape[:2]
    idp = jec.identity_point((Wl,), spec)

    def step(carry, x):
        accT, accR = carry
        accT = jec.ec_add(accT, x, spec)
        accR = jec.ec_add(accR, accT, spec)
        return (accT, accR), None

    xs = {k: v[1:][::-1] for k, v in seq.items()}
    (_, accR), _ = jax.lax.scan(step, (idp, idp), xs)
    return accR


def _sum_seq(seq: Dict, spec=Fq) -> Dict:
    """seq (K, ..., L) -> (..., L): plain sum via sequential scan."""
    shape = seq["x"].shape[1:-1]
    idp = jec.identity_point(shape, spec)

    def step(carry, x):
        return jec.ec_add(carry, x, spec), None

    total, _ = jax.lax.scan(step, idp, seq)
    return total


def _jacobian_bucket_sum(bx, by, binf, W: int, B: int, spec=Fq) -> Dict:
    """(L, W*B) affine buckets -> per-window Jacobian total of
    sum_v v * S_v (batch-major jec combiner).

    Chunked decomposition keeps every module a traced-once lax.scan body:
    with v = q*T + r (S reshaped (G, T) row-major),
        sum_v v*S_v = T * sum_q q*C_q + sum_r r*R_r
    where C_q = sum_r S[q,r] (scan over T) and R_r = sum_q S[q,r] (scan
    over G); the two weighted tails run on G- and T-length sequences."""
    # batch-major (W, B, L) for the jec combiner
    x = jnp.transpose(bx.reshape(L, W, B), (1, 2, 0))
    y = jnp.transpose(by.reshape(L, W, B), (1, 2, 0))
    fin = jnp.logical_not(binf.reshape(W, B))
    one = jnp.broadcast_to(
        jnp.asarray(np.asarray(spec.r_limbs, np.uint32)), (W, B, L)
    )
    z = jnp.where(fin[..., None], one, jnp.zeros_like(one))
    pts = {
        "x": jnp.where(fin[..., None], x, one),
        "y": jnp.where(fin[..., None], y, one),
        "z": z,
    }
    T = min(32, B)
    G = B // T
    s3 = {k: v.reshape(W, G, T, L) for k, v in pts.items()}
    # C_q = sum over r: scan the T axis (leading); (W, G, L) out
    c_q = _sum_seq({k: jnp.moveaxis(v, 2, 0) for k, v in s3.items()}, spec)
    # R_r = sum over q: scan the G axis; (W, T, L) out
    r_r = _sum_seq({k: jnp.moveaxis(v, 1, 0) for k, v in s3.items()}, spec)
    # T * sum_q q*C_q  +  sum_r r*R_r   (sequences put K leading)
    wc = _weighted_sum_seq({k: jnp.moveaxis(v, 1, 0) for k, v in c_q.items()}, spec)
    wr = _weighted_sum_seq({k: jnp.moveaxis(v, 1, 0) for k, v in r_r.items()}, spec)
    for _ in range(T.bit_length() - 1):
        wc = jec.ec_double(wc, spec)
    return jec.ec_add(wc, wr, spec)


@functools.lru_cache(maxsize=None)
def _prologue_fn(c: int, W: int, base=Fq, scalar=Fr):
    def f(points_x, points_y, points_z, scalars_mont):
        scal = F.from_mont(scalar, scalars_mont)
        # jacobian -> affine limbs-first: chunked batch inversion (small
        # modules) + tile-kernel muls; zeros (identity points) -> zeros
        zt = jnp.transpose(points_z, (1, 0))  # (L, n)
        zinv = batch_inv_lf(zt, base)
        zi2 = mul_lf(zinv, zinv, base)
        ax0 = mul_lf(jnp.transpose(points_x, (1, 0)), zi2, base)
        ay0 = mul_lf(
            jnp.transpose(points_y, (1, 0)), mul_lf(zi2, zinv, base), base
        )
        inf0 = F.is_zero(base, points_z)

        digits = _digits_all(scal, c, W)  # (W, n)
        order = jnp.argsort(-digits.astype(jnp.int32), axis=1)  # desc
        flat = order.reshape(-1)  # indexes into the SHARED point array
        ax = jnp.take(ax0, flat, axis=1)  # (L, W*n)
        ay = jnp.take(ay0, flat, axis=1)
        inf = jnp.take(inf0, flat)
        dig = jnp.take_along_axis(digits, order, axis=1).reshape(-1)
        # digit-0 lanes contribute nothing (bucket 0 has weight 0): mark
        # them infinite so the halving tree never touches them
        inf = jnp.logical_or(inf, dig == 0)
        return ax, ay, inf, dig

    return jax.jit(f) if _on_accel() else f


@functools.lru_cache(maxsize=None)
def _epilogue_fn(W: int, B: int, c: int, spec=Fq):
    def f(ax, ay, inf, dig, bx, by, binf):
        bx, by, binf = _final_flush(ax, ay, inf, dig, bx, by, binf, W, B, spec)
        totals = _jacobian_bucket_sum(bx, by, binf, W, B, spec)
        total = {k: v[W - 1] for k, v in totals.items()}
        for w in range(W - 2, -1, -1):
            for _ in range(c):
                total = jec.ec_double(total, spec)
            total = jec.ec_add(total, {k: v[w] for k, v in totals.items()}, spec)
        return total

    return jax.jit(f) if _on_accel() else f


def msm_affine(
    points_bm: Dict,
    scalars_mont: jnp.ndarray,
    base=None,
    scalar=None,
) -> Dict:
    """Variable-base MSM: (n,) batch-major Jacobian point dict + (n, L)
    Montgomery scalars -> single Jacobian point (batch-major coords (L,)).
    n must be a power of two (padded by callers). base/scalar select the
    curve (default BN254 G1; grumpkin = Fr/Fq)."""
    base = base or Fq
    scalar = scalar or Fr
    assert base.num_limbs == L
    n = scalars_mont.shape[0]
    assert n & (n - 1) == 0
    c = _best_c(n, scalar.num_bits)
    B = 1 << c
    W = -(-scalar.num_bits // c)

    ax, ay, inf, dig = _prologue_fn(c, W, base, scalar)(
        points_bm["x"], points_bm["y"], points_bm["z"], scalars_mont
    )

    bx = jnp.zeros((L, W * B), jnp.uint32)
    by = jnp.zeros((L, W * B), jnp.uint32)
    binf = jnp.ones((W * B,), dtype=bool)

    m = n
    while m > 1:
        ax, ay, inf, dig, bx, by, binf = _level_fn(m, W, B, base)(
            ax, ay, inf, dig, bx, by, binf
        )
        m //= 2
    return _epilogue_fn(W, B, c, base)(ax, ay, inf, dig, bx, by, binf)


@functools.lru_cache(maxsize=None)
def _level_fn(m: int, W: int, B: int, spec=Fq):
    # On the accelerator each level is ONE fused module (dispatch latency
    # through the device tunnel dominates). On CPU the same module —
    # two log-depth mont_mul scans inlined — costs minutes of XLA compile,
    # so run the level eagerly there: per-op modules are tiny and reused
    # across levels/tests.
    def f(ax, ay, inf, dig, bx, by, binf):
        return _level_step(ax, ay, inf, dig, bx, by, binf, B, W, spec)

    return jax.jit(f) if _on_accel() else f


def _final_flush(ax, ay, inf, dig, bx, by, binf, W, B, spec=Fq):
    """Flush the last survivor of each window into its bucket (general
    Jacobian add at W lanes: cheap, and avoids affine edge cases)."""
    one = _one_lf(W, spec)
    fin = jnp.logical_not(inf)
    bslot = jnp.where(
        fin, jnp.arange(W, dtype=jnp.uint32) * jnp.uint32(B) + dig, jnp.uint32(W * B)
    )
    safe = jnp.minimum(bslot, W * B - 1)
    gx = jnp.take(bx, safe, axis=1)
    gy = jnp.take(by, safe, axis=1)
    ginf = jnp.take(binf, safe)
    # batch-major jacobian add of (bucket, survivor)
    def to_bm(x, y, isinf):
        o = jnp.transpose(jnp.where(isinf[None, :], one, x), (1, 0))
        p = jnp.transpose(jnp.where(isinf[None, :], one, y), (1, 0))
        zz = jnp.where(
            isinf[:, None],
            jnp.zeros((W, L), jnp.uint32),
            jnp.broadcast_to(
                jnp.asarray(np.asarray(spec.r_limbs, np.uint32)), (W, L)
            ),
        )
        return {"x": o, "y": p, "z": zz}

    res = jec.ec_add(to_bm(gx, gy, ginf), to_bm(ax, ay, inf), spec)
    rz = res["z"]
    rinf = F.is_zero(spec, rz)
    zinv = F.batch_inv(spec, rz)
    zi2 = F.mont_mul(spec, zinv, zinv)
    rx = jnp.transpose(F.mont_mul(spec, res["x"], zi2), (1, 0))
    ry = jnp.transpose(
        F.mont_mul(spec, res["y"], F.mont_mul(spec, zi2, zinv)), (1, 0)
    )
    bx = bx.at[:, bslot].set(rx, mode="drop")
    by = by.at[:, bslot].set(ry, mode="drop")
    binf = binf.at[bslot].set(rinf, mode="drop")
    return bx, by, binf
