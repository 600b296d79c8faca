"""TPU-native prime-field arithmetic on packed 16-bit limbs.

Field elements live on device as ``uint32[..., L]`` arrays holding L little-endian
16-bit limbs (L=16 for 256-bit fields), in Montgomery form with R = 2**(16*L).

Design notes (TPU-first, not a port):
  * All ops are pure jnp element-wise chains over the limb axis so XLA fuses an
    entire field-mul into one VPU kernel; no 64-bit integers are ever used
    (TPU has no native u64 multiply).  A 16x16-bit product fits exactly in u32.
  * The schoolbook product uses *lazy carries*: per-column lo/hi accumulators
    stay < 2^21, so carry chains are deferred to a single 16-step propagation.
  * Montgomery reduction is done limb-by-limb on the redundant accumulator,
    resolving only the carry of the limb being eliminated each step
    (bounds: accumulators stay < 2^23, see `mont_mul`).
  * Batched inversion avoids the reference's sequential Montgomery trick
    (rust: halo2 `BatchInvert`, used e.g. at
    /root/reference/plonkish_backend/src/backend/hyperplonk/prover.rs:226) in
    favour of log-depth prefix/suffix product scans + one Fermat inversion,
    which is the associative-scan-friendly formulation for XLA.

Semantics mirror the reference's field layer (halo2_curves `ff::PrimeField`
as used throughout /root/reference/plonkish_backend), but the implementation
is an independent TPU design.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(value: int, num_limbs: int) -> np.ndarray:
    """Host-side: python int -> uint32[num_limbs] little-endian 16-bit limbs."""
    assert 0 <= value < (1 << (LIMB_BITS * num_limbs))
    return np.array(
        [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(num_limbs)],
        dtype=np.uint32,
    )


def limbs_to_int(limbs) -> int:
    """Host-side: uint32[..., L] (single element) -> python int."""
    limbs = np.asarray(limbs)
    assert limbs.ndim == 1
    return sum(int(l) << (LIMB_BITS * i) for i, l in enumerate(limbs))


def decode_scalar(spec: "FieldSpec", arr) -> int:
    """Single (L,) Montgomery limb array -> canonical python int."""
    a = np.asarray(arr)
    assert a.ndim == 1
    return int(spec.decode(a[None, :])[0])


def limbs_to_ints(limbs) -> np.ndarray:
    """Host-side: uint32[..., L] -> object array of python ints over batch dims."""
    limbs = np.asarray(limbs)
    flat = limbs.reshape(-1, limbs.shape[-1])
    out = np.empty(flat.shape[0], dtype=object)
    for i in range(flat.shape[0]):
        out[i] = limbs_to_int(flat[i])
    return out.reshape(limbs.shape[:-1])


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static parameters of a prime field in packed-limb Montgomery form."""

    name: str
    modulus: int
    num_limbs: int = 16

    # ---- derived host constants (computed in __post_init__) ----

    def __post_init__(self):
        L, p = self.num_limbs, self.modulus
        assert p % 2 == 1 and p < (1 << (LIMB_BITS * L))
        R = 1 << (LIMB_BITS * L)
        object.__setattr__(self, "R", R % p)
        object.__setattr__(self, "R2", (R * R) % p)
        object.__setattr__(self, "R3", (R * R * R) % p)
        # -p^{-1} mod 2^16
        object.__setattr__(self, "npr16", (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        object.__setattr__(self, "p_limbs", int_to_limbs(p, L))
        object.__setattr__(self, "r_limbs", int_to_limbs(R % p, L))
        object.__setattr__(self, "r2_limbs", int_to_limbs((R * R) % p, L))
        object.__setattr__(self, "zero_limbs", np.zeros(L, dtype=np.uint32))
        object.__setattr__(self, "num_bits", p.bit_length())

    # ---- host<->device conversion ----

    def to_mont_int(self, x: int) -> int:
        return (x * getattr(self, "R")) % self.modulus

    def from_mont_int(self, x: int) -> int:
        Rinv = pow(getattr(self, "R"), -1, self.modulus)
        return (x * Rinv) % self.modulus

    def encode(self, values) -> np.ndarray:
        """Python ints (canonical) -> uint32[..., L] Montgomery limbs (host numpy)."""
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        out = np.empty((flat.shape[0], self.num_limbs), dtype=np.uint32)
        for i, v in enumerate(flat):
            out[i] = int_to_limbs(self.to_mont_int(int(v) % self.modulus), self.num_limbs)
        return out.reshape(arr.shape + (self.num_limbs,))

    def canonical_limbs(self, values) -> np.ndarray:
        """Python/machine ints (canonical) -> uint32[..., L] CANONICAL limbs,
        vectorized (no per-element bigint Montgomery multiply — pair with
        to_mont/encode_dev for the Montgomery conversion ON DEVICE). The
        machine-integer fast path is pure uint64 numpy; object arrays use
        vectorized shifts (C-loop per limb, ~10x the naive python loop)."""
        arr = np.asarray(values)
        L = self.num_limbs
        if arr.dtype != object and np.issubdtype(arr.dtype, np.integer):
            v = arr.astype(np.uint64)
            out = np.zeros(arr.shape + (L,), np.uint32)
            for k in range(4):
                out[..., k] = ((v >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(
                    np.uint32
                )
            return out
        flat = np.asarray(values, dtype=object).reshape(-1)
        p = self.modulus
        nb = 2 * L
        buf = b"".join(int(v % p).to_bytes(nb, "little") for v in flat)
        out = (
            np.frombuffer(buf, dtype="<u2").astype(np.uint32).reshape(-1, L)
        )
        return out.reshape(arr.shape + (L,))

    def decode(self, limbs) -> np.ndarray:
        """uint32[..., L] Montgomery limbs -> object array of canonical ints."""
        ints = limbs_to_ints(np.asarray(limbs))
        flat = ints.reshape(-1)
        for i in range(flat.shape[0]):
            flat[i] = self.from_mont_int(flat[i])
        return flat.reshape(ints.shape)

    # ---- device-usable constants ----
    # NOTE: these return plain numpy arrays (NOT jnp) on purpose: a cached
    # jnp array created while tracing would leak a tracer across jit scopes;
    # numpy constants are safely embedded at every use site.

    @property
    def p_dev(self):
        return self.p_limbs

    @property
    def zero(self):
        return self.zero_limbs

    @property
    def one(self):
        """Montgomery representation of 1 (i.e. R mod p)."""
        return self.r_limbs

    @property
    def r2(self):
        return self.r2_limbs


# ---------------------------------------------------------------------------
# limb helpers
# ---------------------------------------------------------------------------


def _shift_pad(x: jnp.ndarray, offset: int, total: int) -> jnp.ndarray:
    """Pad last axis of x (length l) with `offset` zeros in front, to `total`."""
    l = x.shape[-1]
    pads = [(0, 0)] * (x.ndim - 1) + [(offset, total - l - offset)]
    return jnp.pad(x, pads)


def _carry_propagate(t: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Resolve lazy carries: t (..., >=out_limbs) u32 with limbs < 2^32 ->
    canonical 16-bit limbs (..., out_limbs). Assumes final carry-out is zero.

    Limb loops run as lax.scan (graph-size: O(1) instead of O(L) — the limb
    axis is moved to the scan axis; per-step ops stay batch-vectorized)."""
    tv = jnp.moveaxis(t[..., :out_limbs], -1, 0)

    def step(carry, ti):
        v = ti + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    _, outs = jax.lax.scan(step, jnp.zeros(t.shape[:-1], dtype=jnp.uint32), tv)
    return jnp.moveaxis(outs, 0, -1)


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a - b over 16-bit limbs; returns (diff, borrow_out in {0,1})."""
    a, b = jnp.broadcast_arrays(a, b)
    av = jnp.moveaxis(a, -1, 0)
    bv = jnp.moveaxis(b, -1, 0)

    def step(borrow, ab):
        ai, bi = ab
        v = ai - bi - borrow  # u32 wraparound
        return (v >> LIMB_BITS) & 1, v & LIMB_MASK

    borrow, outs = jax.lax.scan(
        step, jnp.zeros(a.shape[:-1], dtype=jnp.uint32), (av, bv)
    )
    return jnp.moveaxis(outs, 0, -1), borrow


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a + b over 16-bit limbs; returns (sum, carry_out)."""
    a, b = jnp.broadcast_arrays(a, b)
    av = jnp.moveaxis(a, -1, 0)
    bv = jnp.moveaxis(b, -1, 0)

    def step(carry, ab):
        ai, bi = ab
        v = ai + bi + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    carry, outs = jax.lax.scan(
        step, jnp.zeros(a.shape[:-1], dtype=jnp.uint32), (av, bv)
    )
    return jnp.moveaxis(outs, 0, -1), carry


def _geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b for canonical limb arrays; returns bool (...)."""
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


# ---------------------------------------------------------------------------
# field ops (all take/return uint32[..., L] Montgomery-form limbs)
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, carry = _add_limbs(a, b)
    # subtract p if s >= p (carry can only be 0 here since a,b < p < 2^255)
    del carry
    d, borrow = _sub_limbs(s, spec.p_dev)
    return jnp.where((borrow == 0)[..., None], d, s)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sub_limbs(a, b)
    dp, _ = _add_limbs(d, spec.p_dev)
    return jnp.where((borrow == 1)[..., None], dp, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    d, _ = _sub_limbs(jnp.broadcast_to(spec.p_dev, a.shape), a)
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    return jnp.where(is_zero, a, d)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def _mont_reduce(spec: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of a lazy 2L-limb accumulator: value(t) * R^{-1} mod p.

    `t` is uint32[..., 2L] with limb weights 2^(16k); limbs may be lazy
    (< 2^28 is safe: during reduction each limb gains <= 2 more 16-bit terms
    per outer step plus carries, staying well below 2^32).

    The L elimination steps run as a lax.scan over a LEFT-SHIFTING window:
    each step cancels the current lowest limb with m = t0 * (-p^-1) mod 2^16,
    adds m*p lazily, and shifts the accumulator down one limb.
    """
    L = spec.num_limbs
    T = 2 * L
    assert t.shape[-1] == T
    p_limbs = spec.p_dev
    npr = jnp.uint32(getattr(spec, "npr16"))
    batch = t.shape[:-1]
    zero1 = jnp.zeros(batch + (1,), dtype=jnp.uint32)
    zeroL = jnp.zeros(batch + (L,), dtype=jnp.uint32)
    zeroL1 = jnp.zeros(batch + (L + 1,), dtype=jnp.uint32)

    def step(t, _):
        carry = t[..., 0] >> LIMB_BITS
        t0 = t[..., 0] & LIMB_MASK
        m = (t0 * npr) & LIMB_MASK
        mp = m[..., None] * p_limbs  # (..., L)
        lo = mp & LIMB_MASK
        hi = mp >> LIMB_BITS
        carry2 = (t0 + lo[..., 0]) >> LIMB_BITS
        tn = jnp.concatenate([t[..., 1:], zero1], axis=-1)
        # after the shift, old position j+1 is new position j:
        # lo[1:] lands at new 0..L-2, hi at new 0..L-1, carries at new 0.
        tn = tn + jnp.concatenate([lo[..., 1:], zeroL1], axis=-1)
        tn = tn + jnp.concatenate([hi, zeroL], axis=-1)
        tn = tn.at[..., 0].add(carry + carry2)
        return tn, None

    t, _ = jax.lax.scan(step, t, None, length=L)
    r = _carry_propagate(t[..., :L], L)
    d, borrow = _sub_limbs(r, p_limbs)
    return jnp.where((borrow == 0)[..., None], d, r)


def _anti_diagonal_sums(M: jnp.ndarray) -> jnp.ndarray:
    """M: (..., L, L) u32 -> (..., 2L-1) with out[k] = sum_{i+j=k} M[i, j].

    Skew trick: pad rows to 2L, drop the trailing L entries of the flattened
    buffer and re-view as (L, 2L-1); row i lands shifted by i, so a single
    axis(-2) sum produces all anti-diagonals. ~5 XLA ops instead of the
    2L pad+add chain — keeps fused kernels (and compile times) small.
    """
    L = M.shape[-1]
    batch = M.shape[:-2]
    pads = [(0, 0)] * len(batch) + [(0, 0), (0, L)]
    Mp = jnp.pad(M, pads)  # (..., L, 2L)
    flat = Mp.reshape(batch + (2 * L * L,))[..., : L * (2 * L - 1)]
    C = flat.reshape(batch + (L, 2 * L - 1))
    return jnp.sum(C, axis=-2, dtype=jnp.uint32)  # terms < 2^16, count L -> < 2^20


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p.

    Lazy-carry schoolbook (column accumulators < 16*2^16 = 2^20) followed by
    limbwise Montgomery reduction, all in u32 — no 64-bit ints anywhere.
    """
    L = spec.num_limbs
    T = 2 * L
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]

    P = a[..., :, None] * b[..., None, :]  # (..., L, L), each < 2^32
    lo = _anti_diagonal_sums(P & LIMB_MASK)  # (..., 2L-1)
    hi = _anti_diagonal_sums(P >> LIMB_BITS)
    zero1 = jnp.zeros(batch + (1,), dtype=jnp.uint32)
    t = jnp.concatenate([lo, zero1], axis=-1) + jnp.concatenate([zero1, hi], axis=-1)
    return _mont_reduce(spec, t)


def square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """canonical limbs -> Montgomery form."""
    return mont_mul(spec, a, jnp.broadcast_to(spec.r2, a.shape))

def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(spec, a, one)


def encode_dev(spec: FieldSpec, values) -> jnp.ndarray:
    """Host ints -> device Montgomery limbs with the bigint work vectorized:
    canonical limb extraction on host (spec.canonical_limbs), Montgomery
    conversion as ONE device mont_mul by R^2 — the per-element python
    `encode` loop is minutes of host time at 2^20 witness sizes."""
    return to_mont(spec, jnp.asarray(spec.canonical_limbs(values)))


def u32_to_mont(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """DEVICE uint32 (...,) small values -> Montgomery limbs (..., L).

    The fully device-resident path for witness integers (Lasso dims,
    read timestamps, final counts): two 16-bit limb extractions + one
    mont_mul by R^2 — no host round-trip anywhere."""
    x = x.astype(jnp.uint32)
    lo = x & LIMB_MASK
    hi = x >> LIMB_BITS
    zeros = jnp.zeros(x.shape + (spec.num_limbs - 2,), dtype=jnp.uint32)
    limbs = jnp.concatenate([lo[..., None], hi[..., None], zeros], axis=-1)
    return to_mont(spec, limbs)


u32_to_mont = jax.jit(u32_to_mont, static_argnums=0)


def pow_fixed(spec: FieldSpec, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent for a host-known exponent, via fori_loop square-and-multiply
    (small XLA graph; the 2*nbits sequential muls are fully batched)."""
    if exponent == 0:
        return jnp.broadcast_to(spec.one, a.shape)
    nbits = exponent.bit_length()
    bits = jnp.asarray(
        np.array([(exponent >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    )

    def body(i, state):
        result, base = state
        bit = bits[i]
        new_result = mont_mul(spec, result, base)
        result = jnp.where((bit == 1)[..., None], new_result, result)
        base = mont_mul(spec, base, base)
        return result, base

    result = jnp.broadcast_to(spec.one, a.shape)
    result, _ = jax.lax.fori_loop(0, nbits, body, (result, a))
    return result


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion a^{p-2}; inv(0) = 0 (matching ff's `invert` on 0 being
    unused — callers guard)."""
    return pow_fixed(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Invert many elements with log-depth scans + ONE Fermat inversion.

    inv(a_i) = prefix_{i-1} * suffix_{i+1} * inv(total). Zero entries map to
    zero (handled by substituting 1 and masking), mirroring BatchInvert's
    skip-zero semantics.
    """
    if axis != 0:
        a = jnp.moveaxis(a, axis, 0)
    zero_mask = jnp.all(a == 0, axis=-1)
    one = jnp.broadcast_to(spec.one, a.shape)
    aa = jnp.where(zero_mask[..., None], one, a)

    mul = functools.partial(mont_mul, spec)
    prefix_inclusive = jax.lax.associative_scan(mul, aa, axis=0)
    suffix_inclusive = jax.lax.associative_scan(mul, aa, axis=0, reverse=True)
    total = prefix_inclusive[-1]
    total_inv = inv(spec, total)

    n = a.shape[0]
    prefix_exclusive = jnp.concatenate(
        [jnp.broadcast_to(spec.one, (1,) + a.shape[1:]), prefix_inclusive[: n - 1]], axis=0
    )
    suffix_exclusive = jnp.concatenate(
        [suffix_inclusive[1:], jnp.broadcast_to(spec.one, (1,) + a.shape[1:])], axis=0
    )
    out = mul(mul(prefix_exclusive, suffix_exclusive), total_inv[None])
    out = jnp.where(zero_mask[..., None], jnp.zeros_like(out), out)
    if axis != 0:
        out = jnp.moveaxis(out, 0, axis)
    return out


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(cond, a, b) broadcasting cond over the limb axis."""
    return jnp.where(cond[..., None], a, b)


# Jit the whole field-op layer (FieldSpec is a frozen/hashable dataclass, so
# it rides as a static argument). Prover-side host orchestration calls these
# eagerly all over; without this each call dispatches its dozens of limb ops
# one at a time — per-op trace/lower dominated e2e wall time. Inside an outer
# jit the wrappers trace through (and the sub-jaxpr lowering cache dedups
# repeated instantiations).
add = jax.jit(add, static_argnums=0)
sub = jax.jit(sub, static_argnums=0)
neg = jax.jit(neg, static_argnums=0)
is_zero = jax.jit(is_zero, static_argnums=0)
mont_mul = jax.jit(mont_mul, static_argnums=0)
square = jax.jit(square, static_argnums=0)
to_mont = jax.jit(to_mont, static_argnums=0)
from_mont = jax.jit(from_mont, static_argnums=0)
pow_fixed = jax.jit(pow_fixed, static_argnums=(0, 2))
inv = jax.jit(inv, static_argnums=0)
batch_inv = jax.jit(batch_inv, static_argnums=(0, 2))


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def sum_reduce(spec: FieldSpec, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Field sum along `axis` — lazy-carry chunked reduction.

    Raw 16-bit limbs are summed in u32 (up to 2^11 terms per chunk keeps
    accumulators < 2^27), then each chunk is renormalized via the Montgomery
    reduction (value*R^{-1}) followed by a mont_mul with R^2, i.e. an exact
    mod-p of the lazy sum. Remaining partial sums are tree-added.
    This replaces the reference's sequential `partials` merge
    (piop/sum_check/classic/eval.rs:127) with a log-depth device reduction.
    """
    if axis != 0:
        a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    L = spec.num_limbs
    CHUNK = 1 << 11
    if n > CHUNK:
        pad = (-n) % CHUNK
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)], axis=0
            )
        a = a.reshape((a.shape[0] // CHUNK, CHUNK) + a.shape[1:])
        s = jnp.sum(a, axis=1, dtype=jnp.uint32)  # lazy limbs < 2^27
        # exact mod-p: mont_reduce gives S*R^{-1}; mont_mul with R^2 restores S.
        t = _shift_pad(s, 0, 2 * L)
        a = mont_mul(spec, _mont_reduce(spec, t), spec.r2)
        n = a.shape[0]
    # small tail: pairwise tree of full adds
    while n > 1:
        if n % 2 == 1:
            a = jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], dtype=a.dtype)], axis=0)
            n += 1
        a = add(spec, a[0::2], a[1::2])
        n = a.shape[0]
    return a[0]


sum_reduce = jax.jit(sum_reduce, static_argnums=(0, 2))
