"""Multi-process / multi-host mesh construction (SURVEY §5: ICI intra-slice,
DCN inter-slice, 1-chip → 1-host → N-host scaling).

Design: the prover is a *multi-controller SPMD* program. Every process runs
the identical host program (the transcript is deterministic host keccak, so
Fiat-Shamir challenges agree everywhere without communication); device
arrays are jax.Arrays over a GLOBAL mesh, and XLA's collectives (psum /
all_gather inserted by shard_map in parallel/sharding.py) carry the only
cross-process traffic:

  * per sumcheck round: one psum of a (degree × L)-word message (<1KB) —
    DCN adds latency, not bandwidth, once per round;
  * per sharded MSM: one all_gather of 3 Jacobian coords per device;
  * host tails / GKR host layers only ever pull REPLICATED arrays
    (parallel/sharding.replicate runs before any np.asarray), which are
    fully-addressable in every process.

Device order in the global mesh is process-major (jax.devices() contract),
so the 1-D "data" axis crosses the DCN only at process boundaries — shard
reductions combine intra-process (ICI) partial sums first.

On real TPU pods `init_process` is jax.distributed.initialize with the
cluster's coordinator; on CPU it federates N local processes (gloo
collectives) for the multi-process dryrun (scripts/dryrun_multiprocess.py).

Reference counterpart: none — the reference's parallelism is single-host
rayon (util/parallel.rs); this layer is the TPU-native scale-out design.
"""

from __future__ import annotations

from typing import Optional


def init_process(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_devices: Optional[int] = None,
    platform: Optional[str] = None,
) -> None:
    """Join the process group. Must run before the jax backend initializes.

    `local_devices`/`platform` are used by the CPU dryrun (gloo collectives
    + N virtual devices per process); on TPU pods leave both None — the
    plugin discovers local chips and ICI/DCN topology itself."""
    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", local_devices)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # generous heartbeat/shutdown windows: on an oversubscribed host one
    # process can lag minutes behind its peers between collectives (the CPU
    # dryrun proves twice per process); the defaults (100s/300s) then fail
    # the shutdown barrier even though every process completes correctly
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        heartbeat_timeout_seconds=600,
        shutdown_timeout_seconds=1800,
    )


def global_mesh():
    """1-D "data" mesh over every device in the process group (process-major
    order: the axis crosses DCN only at process boundaries)."""
    import jax

    from halo2_lasso_tpu.parallel.sharding import make_mesh

    return make_mesh(devices=jax.devices())
