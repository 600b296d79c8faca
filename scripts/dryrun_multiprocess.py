"""Multi-PROCESS sharded-prover dryrun: 2 processes x 4 CPU devices.

Validates that the prover's collectives cross process boundaries (the DCN
story of parallel/distributed.py): each process joins a jax.distributed
group, builds the GLOBAL 8-device mesh, and runs the FULL-FEATURE sharded
HyperPlonk prove (gates + copies + logup + 2 Lasso lookups with GKR memory
check — the same fixture as __graft_entry__.dryrun_multichip). The sharded
proof must be byte-identical to the local single-device proof and verify.

Usage:
  python scripts/dryrun_multiprocess.py            # launcher: spawns workers
  python scripts/dryrun_multiprocess.py --worker I N PORT   # internal
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int, nproc: int, port: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_cpu_max_isa=AVX2 --xla_cpu_parallel_codegen_split_count=1"
    )
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jax._src import compilation_cache as _cc

    _cc.zstd = None
    _cc.zstandard = None
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    from halo2_lasso_tpu.parallel import distributed as dist

    dist.init_process(
        "127.0.0.1:" + port, nproc, pid, local_devices=4, platform="cpu"
    )
    import numpy as np

    from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
    from halo2_lasso_tpu.backend.hyperplonk.fixtures import rand_full_feature_circuit
    from halo2_lasso_tpu.parallel import sharding as sh

    mesh = dist.global_mesh()
    n_global = len(jax.devices())
    assert n_global == nproc * 4, f"expected {nproc * 4} global devices, got {n_global}"

    nv = 6
    circuit_info, circuit = rand_full_feature_circuit(
        nv, np.random.RandomState(nv), np.random.RandomState(100 + nv)
    )
    param = HyperPlonk.setup(circuit_info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, circuit_info)

    tw = new_transcript()
    HyperPlonk.prove(pp, circuit, tw)
    proof_single = tw.into_proof()

    with sh.use_mesh(mesh):
        tw2 = new_transcript()
        HyperPlonk.prove(pp, circuit, tw2)
        proof_sharded = tw2.into_proof()

    assert proof_sharded == proof_single, (
        f"[p{pid}] multi-process sharded proof diverged from single-device"
    )
    HyperPlonk.verify(vp, circuit.instances(), new_transcript(proof_sharded))
    print(
        f"[p{pid}/{nproc}] cross-process sharded proof (nv={nv}, "
        f"{n_global} global devices) byte-identical and verified OK",
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return
    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i), str(nproc), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=3000)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    for i, out in enumerate(outs):
        tail = [l for l in out.splitlines() if l.startswith("[p")]
        print("\n".join(tail) if tail else out[-800:])
    if not ok:
        raise SystemExit("multi-process dryrun FAILED")
    print(f"dryrun_multiprocess: {nproc} processes x 4 CPU devices OK")


if __name__ == "__main__":
    main()
