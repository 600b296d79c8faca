"""Univariate polynomials in coefficient basis, TPU-native.

Semantics mirror /root/reference/plonkish_backend/src/poly/univariate.rs;
needed by the univariate-KZG path (Gemini / Zeromorph / fflonk batch opens).

Coefficients live on device as uint32[n, L] Montgomery limb arrays (padded;
logical degree tracked host-side). The reference's sequential long division
(univariate.rs:144-168) is replaced by:
  * `div_by_linear` — synthetic division as a REVERSED associative scan of
    affine-map compositions (log-depth), since q_i = c_{i+1} + z * q_{i+1};
  * division by small vanishing polys = repeated linear division.
`evaluate` = scan-built powers + lazy inner product.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.field import FieldSpec


def powers_array(spec: FieldSpec, x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^{n-1}] via inclusive associative scan."""
    if n == 1:
        return jnp.asarray(spec.one)[None, :]
    xs = jnp.broadcast_to(x, (n - 1,) + x.shape)
    scan = jax.lax.associative_scan(lambda a, b: F.mont_mul(spec, a, b), xs, axis=0)
    return jnp.concatenate([jnp.asarray(spec.one)[None, :], scan], axis=0)


def evaluate(spec: FieldSpec, coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """sum_i coeffs[i] * x^i -> (L,)."""
    pw = powers_array(spec, x, coeffs.shape[0])
    return F.sum_reduce(spec, F.mont_mul(spec, coeffs, pw))


def div_by_linear(
    spec: FieldSpec, coeffs: jnp.ndarray, z: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(q, r) with f(X) = q(X)*(X - z) + r.

    q_i = c_{i+1} + z*q_{i+1} solved by a reverse scan of affine maps
    f_j(t) = z*t + c_j composed as (m, a)·(m', a') = (m m', a + m a').
    """
    n = coeffs.shape[0]
    zb = jnp.broadcast_to(z, (n,) + z.shape)

    def combine(f, g):
        # reverse-scan element order: `f` is the earlier index; we need
        # S_j = f_j ∘ S_{j+1}, i.e. apply the suffix first, then f_j.
        m1, a1 = f
        m2, a2 = g
        return F.mont_mul(spec, m2, m1), F.add(spec, a2, F.mont_mul(spec, m2, a1))

    # suffix compositions: S_j = f_j ∘ f_{j+1} ∘ ... ∘ f_{n-1}
    _, suffix_a = jax.lax.associative_scan(
        combine, (zb, coeffs), axis=0, reverse=True
    )
    # q_i = (f_{i+1} ∘ ... ∘ f_{n-1})(0) = a-part of S_{i+1}
    q = suffix_a[1:]
    r = suffix_a[0]  # S_0(0) = f(z) evaluated via Horner
    return q, r


def mul_small(spec: FieldSpec, coeffs: jnp.ndarray, small: Sequence[int]) -> jnp.ndarray:
    """coeffs (n, L) * small poly (host ints, degree d) -> (n + d, L)."""
    n = coeffs.shape[0]
    d = len(small) - 1
    out = jnp.zeros((n + d, spec.num_limbs), dtype=jnp.uint32)
    for k, c in enumerate(small):
        if c % spec.modulus == 0:
            continue
        cd = jnp.asarray(spec.encode([c]))[0]
        term = F.mont_mul(spec, coeffs, cd[None, :])
        out = out.at[k : k + n].set(F.add(spec, out[k : k + n], term))
    return out


def add_padded(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = max(a.shape[0], b.shape[0])

    def pad(x):
        if x.shape[0] < n:
            return jnp.concatenate(
                [x, jnp.zeros((n - x.shape[0], spec.num_limbs), dtype=jnp.uint32)]
            )
        return x

    return F.add(spec, pad(a), pad(b))


def div_rem_by_vanishing(
    spec: FieldSpec, coeffs: jnp.ndarray, roots: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Divide by prod (X - root_k): repeated linear division. Returns
    (quotient (n - d, L), remainder coeffs (d, L))."""
    q = coeffs
    for rt in roots:
        zd = jnp.asarray(spec.encode([rt]))[0]
        q, _ = div_by_linear(spec, q, zd)
    # remainder = f - q * V  (degree < d)
    v = vanishing_poly_host(spec.modulus, roots)
    qv = mul_small(spec, q, v)
    d = len(roots)
    f_pad = coeffs
    rem = F.sub(spec, f_pad[:d], qv[:d]) if d > 0 else coeffs[:0]
    return q, rem


def vanishing_poly_host(p: int, roots: Sequence[int]) -> List[int]:
    """Coefficients of prod (X - root) as host ints (low-to-high)."""
    coeffs = [1]
    for rt in roots:
        nxt = [0] * (len(coeffs) + 1)
        for i, c in enumerate(coeffs):
            nxt[i + 1] = (nxt[i + 1] + c) % p
            nxt[i] = (nxt[i] - c * rt) % p
        coeffs = nxt
    return coeffs


def evaluate_host(p: int, coeffs: Sequence[int], x: int) -> int:
    acc = 0
    for c in reversed(list(coeffs)):
        acc = (acc * x + c) % p
    return acc
