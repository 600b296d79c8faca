"""Multi-chip hypercube sharding (mesh + collectives).

The reference's only parallelism is shared-memory rayon chunking
(util/parallel.rs:9-46); the TPU-native equivalent shards the hypercube
index space across a device mesh:

  * MLE tables uint32[2^k, L] are sharded on axis 0 — i.e. by the HIGH index
    bits. Sumcheck folds X_0 (the LOW bit) first, so every fold pairs
    adjacent elements WITHIN a shard: all rounds down to size=num_devices
    are communication-free.
  * Per-round messages are shard-local partial sums combined with a psum of
    lazy u32 limb accumulators (16-bit limbs; <= 2^16-device sums stay in
    u32), renormalized once after the collective.
  * MSM shards its point set; per-shard Pippenger totals are all_gathered
    (3 Jacobian coords each) and tree-added locally — O(D) tiny traffic.

Everything is expressed with shard_map over a 1D mesh axis "data" so the
same kernels serve 1 chip, 1 host, and multi-host slices.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from halo2_lasso_tpu.ops import ec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.field import FieldSpec


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


# ---------------------------------------------------------------------------
# active-mesh context: how a mesh is threaded through the prover stack
# ---------------------------------------------------------------------------
# `with use_mesh(mesh): HyperPlonk.prove(...)` makes every mesh-aware layer
# (sum_check.prove round/fold, prove_coeff_products, ec.variable_base_msm)
# shard its hypercube/point axis over the mesh and combine with collectives.
# Proof bytes are IDENTICAL to the single-device run: every transcript write
# is an exact canonical field element / affine point, and mod-p sums are
# order-independent.

_ACTIVE_MESH: List[Mesh] = []


class use_mesh:
    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_MESH.pop()
        return False


def active_mesh() -> Mesh:
    """The innermost mesh installed by use_mesh, or None (single device)."""
    if _ACTIVE_MESH:
        m = _ACTIVE_MESH[-1]
        if m.size > 1:
            return m
    return None


def replicate(mesh: Mesh, v: jnp.ndarray) -> jnp.ndarray:
    """Gather a sharded array to full replication on every mesh device."""
    return jax.device_put(v, NamedSharding(mesh, PS(*([None] * v.ndim))))


def shard_evals(mesh: Mesh, evals: jnp.ndarray) -> jnp.ndarray:
    """Place an MLE eval table with axis-0 (high index bits) sharding."""
    return jax.device_put(evals, NamedSharding(mesh, PS("data", None)))


def shard_evals_axis1(mesh: Mesh, stacked: jnp.ndarray) -> jnp.ndarray:
    """Place a (T, n, L) stacked eval-table batch with axis-1 sharding."""
    return jax.device_put(stacked, NamedSharding(mesh, PS(None, "data", None)))


def _renormalize(spec: FieldSpec, lazy: jnp.ndarray) -> jnp.ndarray:
    """Exact mod-p of a lazy-limb value (limbs < 2^28): mont_reduce then *R^2."""
    L = spec.num_limbs
    pads = [(0, 0)] * (lazy.ndim - 1) + [(0, L)]
    t = jnp.pad(lazy, pads)
    return F.mont_mul(spec, F._mont_reduce(spec, t), jnp.asarray(spec.r2))


def sharded_sum_reduce(spec: FieldSpec, mesh: Mesh):
    """Returns a jitted f(evals (n, L) sharded) -> (L,) replicated field sum."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(PS("data", None),),
        out_specs=PS(None),
        check_vma=False,
    )
    def inner(local):
        partial = F.sum_reduce(spec, local)  # canonical local sum, (L,)
        total_lazy = jax.lax.psum(partial, "data")  # limbs < 2^16 * D
        return _renormalize(spec, total_lazy)[None]

    return jax.jit(lambda x: inner(x)[0])


def sharded_fix_var(spec: FieldSpec, mesh: Mesh):
    """Returns jitted f(evals (n, L) sharded, x (L,)) -> (n/2, L) sharded.
    X_0-fold is shard-local under axis-0 sharding."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(PS("data", None), PS(None)),
        out_specs=PS("data", None),
        check_vma=False,
    )
    def inner(local, x):
        e0 = local[0::2]
        e1 = local[1::2]
        return F.add(spec, F.mont_mul(spec, F.sub(spec, e1, e0), x[None, :]), e0)

    return jax.jit(inner)


def _leaf_builder(values):
    def leaf(kind, arg):
        if kind == "identity":
            return values[("identity",)]
        if kind == "lagrange":
            return values[("lagrange", arg)]
        if kind == "eq_xy":
            return values[("eq", arg)]
        if kind == "poly":
            return values[("poly", arg.poly, arg.rotation)]
        raise ValueError(kind)

    return leaf


def make_sharded_chunk_fn(
    spec: FieldSpec, mesh: Mesh, terms, degree: int, num_challenges: int
):
    """Sharded EvaluationsProver round kernel over a CHUNK of constraint
    terms (mirrors piop/sum_check._make_chunk_fn; the alpha/coefficient
    combination stays on host). Returns a jitted

        f(arrays: dict of (n, L) sharded leaf tables, chal: (C, L) replicated)
          -> (degree, num_terms, L) replicated per-term column sums

    with one lazy-limb psum per call. Challenge inputs are first-class —
    the composed hyperplonk expression (beta/gamma/alpha) and GKR layers
    (gamma) run sharded."""
    from halo2_lasso_tpu.expression import evaluate_jnp
    from halo2_lasso_tpu.piop.sum_check import _term_leaf_keys

    used = []
    for t in terms:
        for k in _term_leaf_keys(t):
            if k not in used:
                used.append(k)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=({k: PS("data", None) for k in used}, PS(None, None)),
        out_specs=PS(None, None, None),
        check_vma=False,
    )
    def inner(arrays, chal):
        challenges = [chal[i] for i in range(num_challenges)]
        e1 = {k: arrays[k][1::2] for k in used}
        half_local = arrays[used[0]].shape[0] // 2 if used else 1
        step = (
            {k: F.sub(spec, e1[k], arrays[k][0::2]) for k in used}
            if degree > 1
            else None
        )
        half_c = jnp.asarray(spec.encode([half_local]))[0]
        outs = []
        values = e1
        for t in range(1, degree + 1):
            if t > 1:
                values = {k: F.add(spec, values[k], step[k]) for k in used}
            row = []
            for term in terms:
                v = evaluate_jnp(spec, term, _leaf_builder(values), challenges)
                if v.ndim == 1:
                    # hypercube-constant: shard-local half count; psum of
                    # v*half_local over D shards == v * half_total
                    v = F.mont_mul(spec, v, half_c)
                else:
                    v = F.sum_reduce(spec, v)
                row.append(v)
            outs.append(jnp.stack(row))
        total_lazy = jax.lax.psum(jnp.stack(outs), "data")
        return _renormalize(spec, total_lazy)

    inner.__name__ = f"sharded_chunk_fn_{len(terms)}t"
    return jax.jit(inner)


def make_sharded_fold_fn(spec: FieldSpec, mesh: Mesh, keys):
    """Jitted sharded fix_var over a dict of leaf tables: the X_0 fold pairs
    adjacent elements WITHIN each shard under axis-0 (high-bit) sharding, so
    it is communication-free."""
    from halo2_lasso_tpu.poly import multilinear as mle

    keys = tuple(keys)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=({k: PS("data", None) for k in keys}, PS(None)),
        out_specs={k: PS("data", None) for k in keys},
        check_vma=False,
    )
    def inner(arrays, x):
        return {k: mle.fix_var(spec, v, x) for k, v in arrays.items()}

    return jax.jit(inner)


def make_sharded_coeff_fn(spec: FieldSpec, mesh: Mesh):
    """Sharded CoefficientsProver round kernel (degree-2 batch-open sumcheck,
    piop/sum_check.prove_coeff_products): STACKED (T, n, L) terms, per-term
    (c0, c2) column sums with one psum. Module size is constant in T."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(PS(None, "data", None), PS(None, "data", None)),
        out_specs=(PS(None, None), PS(None, None)),
        check_vma=False,
    )
    def inner(eqs, polys):
        e0, e1 = eqs[:, 0::2], eqs[:, 1::2]
        p0, p1 = polys[:, 0::2], polys[:, 1::2]
        c0 = F.sum_reduce(spec, F.mont_mul(spec, e0, p0), axis=1)
        c2 = F.sum_reduce(
            spec,
            F.mont_mul(spec, F.sub(spec, e1, e0), F.sub(spec, p1, p0)),
            axis=1,
        )
        c0 = _renormalize(spec, jax.lax.psum(c0, "data"))
        c2 = _renormalize(spec, jax.lax.psum(c2, "data"))
        return c0, c2

    return jax.jit(inner)


def make_sharded_coeff_fold_fn(spec: FieldSpec, mesh: Mesh):
    """fix_var on a (T, n, L) stacked table, axis-1 ("data") sharded: the X_0
    fold pairs adjacent elements within each shard — communication-free."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(PS(None, "data", None), PS(None)),
        out_specs=PS(None, "data", None),
        check_vma=False,
    )
    def inner(stacked, x):
        e0, e1 = stacked[:, 0::2], stacked[:, 1::2]
        return F.add(
            spec, F.mont_mul(spec, F.sub(spec, e1, e0), x[None, None, :]), e0
        )

    return jax.jit(inner)


_SHARDED_MSM_CACHE: Dict[Tuple, object] = {}


def sharded_msm_cached(mesh: Mesh, window_bits: int = 16):
    key = (id(mesh), window_bits)
    fn = _SHARDED_MSM_CACHE.get(key)
    if fn is None:
        fn = sharded_msm(mesh, window_bits)
        _SHARDED_MSM_CACHE[key] = fn
    return fn


def sharded_msm(mesh: Mesh, window_bits: int = 16):
    """Returns jitted f(points dict (n,) sharded, scalars (n, L) mont sharded)
    -> replicated Jacobian point dict: per-shard Pippenger + all_gather +
    local tree add."""
    from halo2_lasso_tpu.ops.bn254 import Fr

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            {k: PS("data", None) for k in ("x", "y", "z")},
            PS("data", None),
        ),
        out_specs={k: PS(None) for k in ("x", "y", "z")},
        check_vma=False,
    )
    def inner(points, scalars_mont):
        canon = F.from_mont(Fr, scalars_mont)
        local = ec._msm_impl(points, canon, window_bits)
        gathered = {
            k: jax.lax.all_gather(v, "data") for k, v in local.items()
        }  # (D, L)
        return ec.tree_reduce_add(gathered)

    return jax.jit(inner)
