"""One-process recording sweep for every target/bench CSV.

The TPU backend's XLA compiles do not hit the persistent cache across
processes, so each new python invocation of benchmarks/proof_system.py
pays the full cold-compile bill (~15 min for the 2^16 Lasso commit path)
before measuring anything. Running every circuit in ONE process amortizes
the compiles: the MSM/field modules are keyed structurally, so the second
Lasso table, the MSM metric, and the vanilla-plonk sweep reuse the modules
the first prove compiled.

Order (cheapest evidence first, so a timeout still leaves numbers):
  1. lasso_range k=16  (BASELINE config 2: 2^16 lookups, 2^16 range table)
  2. msm 2^16          (points/s; modules shared with step 1's commits)
  3. lasso_and k=16    (config-3 table shape: 32-bit operands, 8-bit chunks)
  4. vanilla_plonk k=4..12 sweep (reference proof_system.rs CSV discipline)
  5. arx_chain k=10    (structured Lasso-native circuit)
  6. (RECORD_BIG=1) lasso_and k=18/20 — config 3 at scale

Usage: python scripts/record_bench_all.py [steps...]   (default: all)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "proof_system", os.path.join(REPO, "benchmarks", "proof_system.py")
)
ps = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ps)

import numpy as np

OUTDIR = os.path.join(REPO, "target", "bench")
os.makedirs(OUTDIR, exist_ok=True)


def record(name: str, k: int, avg_ms: float) -> None:
    line = f"{k}, {avg_ms:.3f}"
    print(f"[record] {name}: {line}", flush=True)
    with open(os.path.join(OUTDIR, name), "a") as f:
        f.write(line + "\n")


def msm_ms(k: int = 16) -> float:
    import jax.numpy as jnp

    from halo2_lasso_tpu.ops import ec, msm_jacobian
    from halo2_lasso_tpu.ops.bn254 import Fr

    n = 1 << k
    rng = np.random.RandomState(5)
    ms = [int(v) for v in rng.randint(1, 1 << 30, size=n)]
    pts = ec.fixed_base_msm(ec.g1_generator(), jnp.asarray(Fr.encode(ms)), 30)
    sc = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(n)]
    scal = jnp.asarray(Fr.encode(sc))
    for _ in range(2):
        np.asarray(msm_jacobian.msm(pts, scal)["x"])
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        np.asarray(msm_jacobian.msm(pts, scal)["x"])
    return (time.time() - t0) / iters * 1e3


def main() -> None:
    steps = sys.argv[1:] or ["lasso_range", "msm", "lasso_and", "vanilla", "arx"]
    t0 = time.time()
    for step in steps:
        print(f"[step] {step} (t={time.time() - t0:.0f}s)", flush=True)
        try:
            if step == "lasso_range":
                record("lasso_range", 16, ps.bench_lasso("lasso_range", 16, 1))
            elif step == "msm":
                record("msm", 16, msm_ms(16))
            elif step == "lasso_and":
                record("lasso_and", 16, ps.bench_lasso("lasso_and", 16, 1))
            elif step == "vanilla":
                for k in range(4, 13):
                    record("hyperplonk", k, ps.bench_hyperplonk("vanilla_plonk", k, 1))
            elif step == "arx":
                kk = int(os.environ.get("RECORD_ARX_K", "14"))
                record("arx_chain", kk, ps.bench_arx_chain(kk, 1))
            elif step == "lasso_and_big":
                kk = int(os.environ.get("RECORD_BIG_K", "18"))
                record("lasso_and", kk, ps.bench_lasso("lasso_and", kk, 1))
            else:
                print(f"[skip] unknown step {step}", flush=True)
        except Exception as e:  # keep recording the rest on a failure
            print(f"[error] {step}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
