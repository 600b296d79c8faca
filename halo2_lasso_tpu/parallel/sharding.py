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


def shard_evals(mesh: Mesh, evals: jnp.ndarray) -> jnp.ndarray:
    """Place an MLE eval table with axis-0 (high index bits) sharding."""
    return jax.device_put(evals, NamedSharding(mesh, PS("data", None)))


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


def sharded_round_message(spec: FieldSpec, expression, keys, degree: int, mesh: Mesh):
    """Sharded EvaluationsProver round kernel: dict of sharded leaf tables ->
    (degree, L) replicated evals at t=1..degree (the per-round transcript
    message before the evals[0] = sum - evals[1] completion)."""
    from halo2_lasso_tpu.expression import evaluate_jnp

    def leaf_builder(values):
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

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=({k: PS("data", None) for k in keys}, [PS(None)] * 0),
        out_specs=PS(None),
        check_vma=False,
    )
    def inner(arrays, _challenges):
        e1 = {k: arrays[k][1::2] for k in arrays}
        step = {k: F.sub(spec, e1[k], arrays[k][0::2]) for k in arrays}
        out = []
        values = e1
        for t in range(1, degree + 1):
            if t > 1:
                values = {k: F.add(spec, values[k], step[k]) for k in values}
            term = evaluate_jnp(spec, expression, leaf_builder(values), [])
            partial = F.sum_reduce(spec, term)
            total_lazy = jax.lax.psum(partial, "data")
            out.append(_renormalize(spec, total_lazy))
        return jnp.stack(out)

    return jax.jit(lambda arrays: inner(arrays, []))


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
