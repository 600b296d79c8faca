"""Multi-chip scaling-efficiency report (SURVEY.md §7 step 8, north star
>70% efficiency).

Real multi-chip hardware is not reachable from this image, so the sweep
runs the sharded flagship round kernel (parallel/sharding.py
make_sharded_chunk_fn + make_sharded_fold_fn — the exact kernels the
sharded HyperPlonk prover calls) on an N-virtual-device CPU mesh with XLA
intra-op parallelism pinned to ONE thread per device. Each virtual device
is then a single host core, so strong-scaling efficiency across N devices
measures the genuine parallel fraction of the sharded kernel — the sharding
layout + psum overhead — rather than intra-op thread scaling that a 1-chip
run would already enjoy.

What this does NOT measure: ICI latency/bandwidth (virtual-device
collectives are memcpys). The sharded round's collective traffic is O(d)
limb vectors per round (one psum of the degree-many partial message sums)
against O(2^k / N) elementwise compute per device, so on real ICI the
collective cost is noise for k >= ~14; the host-core sweep is the honest
lower bound for the compute-side efficiency.

Usage: python benchmarks/scaling.py [--k 16] [--devices 1,2,4]
Writes target/bench/scaling CSV (n_devices, ms_per_round, efficiency) and
prints a JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(n_devices: int, k: int) -> None:
    """Runs in a subprocess with XLA_FLAGS already set: times the sharded
    round (message + fold) at 2^k total hypercube points."""
    import time

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS from the environment; force
    # the CPU backend through the config (mirrors tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from halo2_lasso_tpu.ops import field as F  # noqa: F401
    from halo2_lasso_tpu.ops.bn254 import Fr
    from halo2_lasso_tpu.parallel import sharding as sh

    sys.path.insert(0, REPO)
    from __graft_entry__ import _flagship_round

    assert len(jax.devices()) >= n_devices
    mesh = sh.make_mesh(n_devices)
    expression, arrays, challenge = _flagship_round(k)
    degree = expression.degree
    keys = list(arrays.keys())

    sharded = {kk: sh.shard_evals(mesh, v) for kk, v in arrays.items()}
    round_fn = sh.make_sharded_chunk_fn(Fr, mesh, [expression], degree, 0)
    fold_fn = sh.make_sharded_fold_fn(Fr, mesh, keys)
    chal0 = jnp.zeros((0, Fr.num_limbs), dtype=jnp.uint32)

    def step():
        msgs = round_fn(sharded, chal0)  # no challenge leaves in this expr
        folded = fold_fn(sharded, challenge)
        jax.block_until_ready(msgs)
        jax.block_until_ready(folded[keys[0]])

    for _ in range(2):  # compile + warm
        step()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"n": n_devices, "ms": dt * 1e3}))


def worker_prove(n_devices: int, nv: int) -> None:
    """Times the FULL sharded prove (rand_full_feature_circuit: gates +
    copies + logup + 2 Lasso lookups w/ GKR memory check) on an n-device
    mesh — commits, zero check, z-polys, GKR, batch open, host tails and
    all. This is the end-to-end scaling number (VERDICT r4 Weak #4): the
    replicated tails and host syncs that the round-kernel microbench
    cannot see are all inside the measurement."""
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np

    from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
    from halo2_lasso_tpu.backend.hyperplonk.fixtures import rand_full_feature_circuit
    from halo2_lasso_tpu.parallel import sharding as sh

    assert len(jax.devices()) >= n_devices
    mesh = sh.make_mesh(n_devices)
    circuit_info, circuit = rand_full_feature_circuit(
        nv, np.random.RandomState(nv), np.random.RandomState(100 + nv)
    )
    param = HyperPlonk.setup(circuit_info, np.random.RandomState(0))
    pp, _vp = HyperPlonk.preprocess(param, circuit_info)

    def step():
        tw = new_transcript()
        with sh.use_mesh(mesh):
            HyperPlonk.prove(pp, circuit, tw)
        return tw.into_proof()

    step()  # compile + warm
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"n": n_devices, "ms": dt * 1e3}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--nv", type=int, default=10, help="--prove circuit size")
    ap.add_argument("--devices", type=str, default="1,2,4")
    ap.add_argument("--worker", type=int, default=0)
    ap.add_argument("--prove", action="store_true", help="full-prove scaling")
    args = ap.parse_args()

    if args.worker:
        if args.prove:
            worker_prove(args.worker, args.nv)
        else:
            worker(args.worker, args.k)
        return

    ncore = os.cpu_count() or 1
    rows = []
    for n in [int(s) for s in args.devices.split(",")]:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n} "
            "--xla_cpu_max_isa=AVX2 --xla_cpu_parallel_codegen_split_count=1 "
            # one XLA compute thread per virtual device: scaling across the
            # mesh is then real core-level parallelism, not intra-op threads
            "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
        )
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache_scaling")
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(n)]
        cmd += ["--prove", "--nv", str(args.nv)] if args.prove else ["--k", str(args.k)]
        out = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-2000:])
            raise SystemExit(f"worker n={n} failed")
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rec["oversubscribed"] = rec["n"] > ncore
        rows.append(rec)

    t1 = rows[0]["ms"] * rows[0]["n"]  # normalize if sweep doesn't start at 1
    for r in rows:
        r["efficiency"] = round(t1 / (r["n"] * r["ms"]), 4)

    os.makedirs(os.path.join(REPO, "target", "bench"), exist_ok=True)
    name = "scaling_prove" if args.prove else "scaling"
    header = (
        f"# full-feature sharded prove, nv={args.nv}, 1 thread/device, {ncore} cores"
        if args.prove
        else f"# sharded flagship round, k={args.k}, 1 thread/device, {ncore} cores"
    )
    with open(os.path.join(REPO, "target", "bench", name), "w") as f:
        f.write(header + "\n")
        for r in rows:
            over = "  # OVERSUBSCRIBED: more devices than cores" if r["oversubscribed"] else ""
            f.write(f"{r['n']}, {r['ms']:.3f}, {r['efficiency']:.4f}{over}\n")
    print(json.dumps({("nv" if args.prove else "k"): (args.nv if args.prove else args.k), "rows": rows}))


if __name__ == "__main__":
    main()
