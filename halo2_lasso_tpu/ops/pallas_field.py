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
