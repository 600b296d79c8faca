"""Dense multilinear extensions (MLEs) over the boolean hypercube — TPU core.

Layout: an MLE over k variables is a device array ``uint32[2^k, L]`` of
Montgomery-form field elements; hypercube index b has variable X_0 as its
LEAST-significant bit (matching /root/reference/plonkish_backend/src/poly/
multilinear.rs — `fix_var` merges adjacent pairs, `eq_xy` expands from the
last variable).

All bulk ops are pure jnp so callers can jit/pjit entire prover phases:
  * ``fix_var``       — strided pairwise lerp, the sumcheck fold primitive
                        (multilinear.rs:599-618 `merge_into` semantics);
  * ``eq_xy``         — log-depth doubling expansion (multilinear.rs:91-127);
  * ``fix_last_vars`` — high-variable folds (multilinear.rs:158-177);
  * ``evaluate``      — full fold (multilinear.rs:137-156).

Rotations (halo2 `Rotation` over the bh cyclic order) are evaluated by
gathers with precomputed index maps; verifier-side recombination
(`rotation_eval`, multilinear.rs:433-470) runs on host ints.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.field import FieldSpec
from halo2_lasso_tpu.poly.bh import BooleanHypercube


# ---------------------------------------------------------------------------
# device-level MLE ops
# ---------------------------------------------------------------------------


def _eq_xy_doubling(spec: FieldSpec, y: jnp.ndarray) -> jnp.ndarray:
    """Reference doubling expansion (one module per level; parity oracle)."""
    k = y.shape[0]
    L = y.shape[-1]
    evals = spec.one[None, :]
    for i in range(k - 1, -1, -1):
        hi = F.mont_mul(spec, evals, y[i][None, :])
        lo = F.sub(spec, evals, hi)
        evals = jnp.stack([lo, hi], axis=1).reshape(-1, L)
    return evals


_EQ_XY_FNS: dict = {}


def eq_xy(spec: FieldSpec, y: jnp.ndarray) -> jnp.ndarray:
    """eq(X, y) table over 2^k points; y: (k, L) Montgomery limbs.
    Index bit i of the output corresponds to y_i (multilinear.rs:91-127).

    Shape-uniform product form: eq(x, y) = prod_i (x_i ? y_i : 1 - y_i),
    computed as a lax.scan over the k factors at the FULL (2^k, L) shape.
    One mont_mul instance per compiled module (vs one differently-shaped
    module per doubling level) — this jaxlib's XLA:TPU backend spends ~20s
    per inlined mont_mul graph, so the doubling form cost ~20s*k of compile
    at every new k while this compiles once in ~20s. The k*2^k muls at
    run time are noise next to that (and next to the prover's own folds).
    """
    k = int(y.shape[0])
    L = int(y.shape[-1])
    if k == 0:
        return spec.one[None, :]
    key = (spec.modulus, k, L)
    fn = _EQ_XY_FNS.get(key)
    if fn is None:
        n = 1 << k

        @jax.jit
        def fn(y):
            bitpos = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
            acc = jnp.broadcast_to(spec.one, (n, L))

            def body(acc, iy):
                i, yi = iy
                bit = (bitpos >> i) & jnp.uint32(1)
                not_yi = F.sub(spec, spec.one[None, :], yi[None, :])
                fac = jnp.where(bit == 1, yi[None, :], not_yi)
                return F.mont_mul(spec, acc, fac), None

            acc, _ = jax.lax.scan(
                body, acc, (jnp.arange(k, dtype=jnp.uint32), y)
            )
            return acc

        _EQ_XY_FNS[key] = fn
    return fn(y)


def fix_var(spec: FieldSpec, evals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Fix X_0 := x. evals: (n, L) -> (n/2, L); out_b = (e_{2b+1}-e_{2b})*x + e_{2b}."""
    e0 = evals[0::2]
    e1 = evals[1::2]
    return F.add(spec, F.mont_mul(spec, F.sub(spec, e1, e0), x[None, :]), e0)


def fix_last_var(spec: FieldSpec, evals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Fix the highest variable := x. evals: (n, L) -> (n/2, L)."""
    n = evals.shape[0] // 2
    lo = evals[:n]
    hi = evals[n:]
    return F.add(spec, F.mont_mul(spec, F.sub(spec, hi, lo), x[None, :]), lo)


def evaluate(spec: FieldSpec, evals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the MLE at point x: (k, L). Returns (L,)."""
    k = x.shape[0]
    assert evals.shape[0] == 1 << k
    for i in range(k):
        evals = fix_var(spec, evals, x[i])
    return evals[0]


def evaluate_many(spec: FieldSpec, evals: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate one MLE at many points xs: (m, k, L). Returns (m, L)."""
    return jax.vmap(lambda x: evaluate(spec, evals, x))(xs)


_EVAL_STACK_FNS: dict = {}


def evaluate_stacked_ints(spec: FieldSpec, polys, x) -> list:
    """Evaluate MANY MLEs (same size) at ONE point: [(2^k, L)] + host point
    ints -> list of canonical ints, with a single jitted fold chain over the
    stacked (P, 2^k, L) array and ONE device->host pull (a per-poly
    evaluate+decode costs a full tunnel round-trip each — ~65ms x P in the
    prover's open phase)."""
    P = len(polys)
    k = len(x)
    if P == 0:
        return []
    # chunk the stack: the first fold's mont_mul materializes a
    # (chunk, 2^(k-1), L, 2L) schoolbook intermediate (~320B/element) — an
    # unchunked 40-poly stack at k=20 asked for 13GB of HBM in one pad op
    budget = 1 << 22
    chunk = max(1, budget // max(1, 1 << k))
    xd = jnp.asarray(spec.encode(list(x)))
    outs = []
    for off in range(0, P, chunk):
        group = list(polys[off : off + chunk])
        key = (spec.name, len(group), k)
        fn = _EVAL_STACK_FNS.get(key)
        if fn is None:

            def make(kk):
                @jax.jit
                def fn(stacked, xd):
                    for i in range(kk):
                        e0 = stacked[:, 0::2]
                        e1 = stacked[:, 1::2]
                        stacked = F.add(
                            spec,
                            F.mont_mul(
                                spec, F.sub(spec, e1, e0), xd[i][None, None, :]
                            ),
                            e0,
                        )
                    return stacked[:, 0]

                return fn

            fn = make(k)
            _EVAL_STACK_FNS[key] = fn
        outs.append(fn(jnp.stack(group), xd))
    out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return [int(v) for v in spec.decode(np.asarray(out))]


# ---------------------------------------------------------------------------
# MLE wrapper
# ---------------------------------------------------------------------------


class MLE:
    """Thin wrapper: device evals (2^k, L) + spec. Ops return new MLEs."""

    __slots__ = ("spec", "evals", "num_vars")

    def __init__(self, spec: FieldSpec, evals: jnp.ndarray):
        self.spec = spec
        n = evals.shape[0]
        assert n & (n - 1) == 0
        self.num_vars = n.bit_length() - 1
        self.evals = evals

    @staticmethod
    def from_ints(spec: FieldSpec, values: Sequence[int]) -> "MLE":
        return MLE(spec, jnp.asarray(spec.encode(list(values))))

    def to_ints(self) -> List[int]:
        return [int(v) for v in self.spec.decode(np.asarray(self.evals))]

    def evaluate_ints(self, x: Sequence[int]) -> int:
        xd = jnp.asarray(self.spec.encode(list(x)))
        return int(self.spec.decode(np.asarray(evaluate(self.spec, self.evals, xd))[None])[0])


# ---------------------------------------------------------------------------
# host-side scalar helpers (python ints mod p) — verifier-domain math
# ---------------------------------------------------------------------------


def lagrange_eval_host(p: int, x: Sequence[int], b: int) -> int:
    """prod_i (x_i if b_i else 1-x_i)  (piop/sum_check.rs:100-110)."""
    acc = 1
    for i, xi in enumerate(x):
        acc = acc * (xi if (b >> i) & 1 else (1 - xi) % p) % p
    return acc


def eq_xy_eval_host(p: int, x: Sequence[int], y: Sequence[int]) -> int:
    """prod_i (2 x_i y_i + 1 - x_i - y_i)  (piop/sum_check.rs:112-122)."""
    acc = 1
    for xi, yi in zip(x, y):
        acc = acc * ((2 * xi * yi + 1 - xi - yi) % p) % p
    return acc


def identity_eval_host(p: int, x: Sequence[int]) -> int:
    """sum_i x_i * 2^i  (piop/sum_check.rs:124-126)."""
    acc = 0
    for i, xi in enumerate(x):
        acc = (acc + (xi << i)) % p
    return acc


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------


def _nth_bit(v: int, n: int) -> int:
    return (v >> n) & 1


def rotation_eval_point_pattern(next_: bool, num_vars: int, distance: int) -> List[int]:
    """Index patterns for the 2^distance rotated-evaluation points
    (multilinear.rs:472-494 semantics)."""
    bh = BooleanHypercube(num_vars)
    remainder = bh.primitive if next_ else bh.x_inv
    pattern = [0] * (1 << distance)
    for depth in range(distance):
        step = 1 << (distance - depth)
        half = step >> 1
        for e in range(0, len(pattern), step):
            o = e + half
            rotated = (pattern[e] << 1) if next_ else (pattern[e] >> 1)
            pattern[o] = rotated ^ remainder
            pattern[e] = rotated
    return pattern


def rotation_eval_coeff_pattern(next_: bool, num_vars: int, distance: int) -> List[int]:
    """Bit patterns steering the verifier recombination
    (multilinear.rs:496-518 semantics)."""
    bh = BooleanHypercube(num_vars)
    remainder = (bh.primitive - (1 << num_vars)) if next_ else (bh.x_inv << distance)
    pattern = [0] * (1 << (distance - 1))
    for depth in range(distance - 1):
        step = 1 << (distance - depth - 1)
        half = step >> 1
        for e in range(0, len(pattern), step):
            o = e + half
            rotated = (pattern[e] << 1) if next_ else (pattern[e] >> 1)
            pattern[o] = rotated ^ remainder
            pattern[e] = rotated
    return pattern


def rotation_eval_points(p: int, x: Sequence[int], rotation: int) -> List[List[int]]:
    """The 2^distance points whose evaluations determine f(rot(x))
    (multilinear.rs:472-530 semantics); host ints mod p."""
    if rotation == 0:
        return [list(x)]
    distance = abs(rotation)
    num_x = len(x) - distance
    if rotation < 0:
        pattern = rotation_eval_point_pattern(False, len(x), distance)
        xs = list(x[distance:])
        flipped = [(1 - xi) % p for xi in xs]
        points = []
        for pat in pattern:
            pt = [flipped[i] if _nth_bit(pat, i) else xs[i] for i in range(num_x)]
            pt += [_nth_bit(pat, i + num_x) for i in range(distance)]
            points.append(pt)
        return points
    else:
        pattern = rotation_eval_point_pattern(True, len(x), distance)
        xs = list(x[:num_x])
        flipped = [(1 - xi) % p for xi in xs]
        points = []
        for pat in pattern:
            pt = [_nth_bit(pat, i) for i in range(distance)]
            pt += [flipped[i] if _nth_bit(pat, i + distance) else xs[i] for i in range(num_x)]
            points.append(pt)
        return points


def rotation_eval(p: int, x: Sequence[int], rotation: int, evals_for_rotation: Sequence[int]) -> int:
    """Recombine the 2^distance point-evaluations into f(rot(x))
    (multilinear.rs:433-470 semantics); host ints mod p."""
    if rotation == 0:
        assert len(evals_for_rotation) == 1
        return evals_for_rotation[0] % p
    num_vars = len(x)
    distance = abs(rotation)
    assert len(evals_for_rotation) == 1 << distance
    assert distance <= num_vars

    if rotation < 0:
        pattern = rotation_eval_coeff_pattern(False, num_vars, distance)
        nths = list(range(distance, 0, -1))
        xs = [x[i] for i in range(distance - 1, -1, -1)]
    else:
        pattern = rotation_eval_coeff_pattern(True, num_vars, distance)
        nths = [num_vars - 1 + i for i in range(distance)]
        xs = [x[num_vars - distance + i] for i in range(distance)]

    evals = [v % p for v in evals_for_rotation]
    for idx, (x_i, nth) in enumerate(zip(xs, nths)):
        pats = pattern[:: 1 << idx]
        new_evals = []
        for j in range(0, len(evals), 2):
            e0, e1 = evals[j], evals[j + 1]
            bit = _nth_bit(pats[j // 2], nth)
            if bit:
                new_evals.append(((e0 - e1) * x_i + e1) % p)
            else:
                new_evals.append(((e1 - e0) * x_i + e0) % p)
        evals = new_evals
    return evals[0]


def evaluate_for_rotation(
    spec: FieldSpec, evals: jnp.ndarray, x: Sequence[int], rotation: int
) -> List[int]:
    """Evaluations of the MLE at the 2^distance rotated points, as host ints.

    Equivalent to multilinear.rs:191-263: evaluating the poly at each of
    `rotation_eval_points(x, rotation)`; here done as one vmapped fold batch.
    """
    pts = rotation_eval_points(spec.modulus, list(x), rotation)
    xd = jnp.asarray(spec.encode(pts))  # (2^d, k, L)
    out = evaluate_many(spec, evals, xd)  # (2^d, L)
    return [int(v) for v in spec.decode(np.asarray(out))]


def rotate_evals(spec: FieldSpec, evals: jnp.ndarray, rotation: int) -> jnp.ndarray:
    """Materialize the rotated poly: out[b] = evals[rotate(b, rotation)]
    (the round-0 gather of classic.rs:104-129)."""
    k = evals.shape[0].bit_length() - 1
    rmap = BooleanHypercube(k).rotation_map(rotation)
    return jnp.take(evals, jnp.asarray(rmap), axis=0)
