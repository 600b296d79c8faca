"""Proof-system benchmark CLI.

Mirrors the reference harness (/root/reference/benchmark/benches/
proof_system.rs:253-329): `--system --circuit --k`, timing samples written
as `k, avg_ms` lines to target/bench/<system>, with phase timer traces
(HALO2_LASSO_TPU_TIMER=1) consumable by benchmarks/plotter.py.

Systems: hyperplonk (this framework). The reference also benches halo2 and
espresso_hyperplonk as external CPU baselines — those are separate Rust
binaries not available here; their slots in the CSV format are kept so
results can be merged for comparison.

Circuits: vanilla_plonk, vanilla_plonk_with_lookup (both from the shared
fixtures), lasso_range (2^k lookups into a range table).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

# the zstandard cache backend segfaults/corrupts intermittently on this
# image (see tests/conftest.py); force the zlib framing
from jax._src import compilation_cache as _cc

_cc.zstd = None
_cc.zstandard = None

import numpy as np


def sample_size(k: int) -> int:
    # proof_system.rs:321-329
    if k < 16:
        return 20
    if k < 20:
        return 5
    return 1


def bench_hyperplonk(circuit: str, k: int, samples: int) -> float:
    from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
    from halo2_lasso_tpu.backend.hyperplonk.fixtures import (
        rand_vanilla_plonk_circuit,
        rand_vanilla_plonk_with_lookup_circuit,
    )

    fn = {
        "vanilla_plonk": rand_vanilla_plonk_circuit,
        "vanilla_plonk_with_lookup": rand_vanilla_plonk_with_lookup_circuit,
    }[circuit]
    info, circ = fn(k, np.random.RandomState(k), np.random.RandomState(100 + k))
    param = HyperPlonk.setup(info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, info)

    # warm-up (compiles)
    tw = new_transcript()
    HyperPlonk.prove(pp, circ, tw)
    proof = tw.into_proof()
    tr = new_transcript(proof)
    HyperPlonk.verify(vp, circ.instances(), tr)

    t0 = time.perf_counter()
    for _ in range(samples):
        tw = new_transcript()
        HyperPlonk.prove(pp, circ, tw)
    return (time.perf_counter() - t0) / samples * 1e3


def _lasso_table(circuit: str):
    from halo2_lasso_tpu.lasso.tables import (
        and_table,
        lt_table,
        range_table,
        xor_table,
    )

    # lasso_range: BASELINE config 2 (2^16 range table);
    # lasso_and/xor/lt: config 3 structured 32-bit operand tables (2^16
    # Surge subtables, grand-product memory check)
    return {
        "lasso_range": lambda: range_table(16, 16),
        "lasso_and": lambda: and_table(32, 8),
        "lasso_xor": lambda: xor_table(32, 8),
        "lasso_lt": lambda: lt_table(32, 8),
    }[circuit]()


def _cached_kzg_setup(nv: int):
    """SRS generation at 2^nv is minutes of fixed-base MSM on a cold cache;
    persist it under target/srs so repeated bench invocations (and the
    sweep's larger k) skip straight to the prove being measured."""
    from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg
    from halo2_lasso_tpu.utils.serialize import load_kzg_params, save_kzg_params

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "target", "srs", f"kzg_nv{nv}"
    )
    try:
        params = load_kzg_params(path)
        if params.__class__.__name__ != "KzgParams":
            raise ValueError("unexpected params kind")
        return params
    except FileNotFoundError:
        pass
    except Exception:
        # a truncated npz from a crash mid-save raises zipfile.BadZipFile
        # (and friends) — drop the corrupt cache and regenerate
        for ext in (".npz", ".json"):
            try:
                os.remove(path + ext)
            except OSError:
                pass
    param = MultilinearKzg.setup(1 << nv, np.random.RandomState(3))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # atomic publish: write to temp names, then rename (readers never see a
    # half-written cache)
    tmp = path + ".tmp"
    save_kzg_params(tmp, param)
    os.replace(tmp + ".npz", path + ".npz")
    os.replace(tmp + ".json", path + ".json")
    return param


def bench_lasso(circuit: str, k: int, samples: int) -> float:
    from halo2_lasso_tpu import lasso
    from halo2_lasso_tpu.backend.hyperplonk import new_transcript
    from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg

    table = _lasso_table(circuit)
    rng = np.random.RandomState(7)
    hi = min(table.index_bits, 62)
    indices = [int(v) for v in rng.randint(0, 1 << hi, size=1 << k, dtype=np.int64)]
    nv = max(k, table.memories[0].subtable.index_bits)
    param = _cached_kzg_setup(nv)
    pp, vp = MultilinearKzg.trim(param, 1 << nv)

    tw = new_transcript()
    lasso.prove(pp, table, indices, tw)  # warm-up
    # the recorded number is only evidence if the proof is sound
    lasso.verify(vp, table, k, new_transcript(tw.into_proof()))

    t0 = time.perf_counter()
    for _ in range(samples):
        tw = new_transcript()
        lasso.prove(pp, table, indices, tw)
    return (time.perf_counter() - t0) / samples * 1e3


def bench_arx_chain(k: int, samples: int) -> float:
    """Structured big circuit (frontend/arx.py; reference counterpart:
    benchmark sha256/aggregation circuits) e2e through HyperPlonk."""
    from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
    from halo2_lasso_tpu.frontend.arx import arx_chain_circuit

    info, circ = arx_chain_circuit(k)
    param = HyperPlonk.setup(info, np.random.RandomState(0))
    pp, vp = HyperPlonk.preprocess(param, info)

    tw = new_transcript()
    HyperPlonk.prove(pp, circ, tw)  # warm-up
    tr = new_transcript(tw.into_proof())
    HyperPlonk.verify(vp, circ.instances(), tr)

    t0 = time.perf_counter()
    for _ in range(samples):
        tw = new_transcript()
        HyperPlonk.prove(pp, circ, tw)
    return (time.perf_counter() - t0) / samples * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", default="hyperplonk", choices=["hyperplonk"])
    ap.add_argument(
        "--circuit",
        default="vanilla_plonk",
        choices=[
            "vanilla_plonk",
            "vanilla_plonk_with_lookup",
            "lasso_range",
            "lasso_and",
            "lasso_xor",
            "lasso_lt",
            "arx_chain",
        ],
    )
    ap.add_argument("--k", default="4..8", help="k or k range lo..hi")
    ap.add_argument("--samples", type=int, default=None)
    args = ap.parse_args()

    if ".." in args.k:
        lo, hi = args.k.split("..")
        ks = range(int(lo), int(hi))
    else:
        ks = [int(args.k)]

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "target", "bench")
    os.makedirs(outdir, exist_ok=True)
    # reference appends to target/bench/<system> (proof_system.rs:306-319);
    # lasso_* / arx_chain are this framework's own circuits — separate files
    own = args.circuit.startswith("lasso_") or args.circuit == "arx_chain"
    name = args.circuit if own else args.system
    outfile = os.path.join(outdir, name)

    for k in ks:
        samples = args.samples or sample_size(k)
        if args.circuit.startswith("lasso_"):
            avg_ms = bench_lasso(args.circuit, k, samples)
        elif args.circuit == "arx_chain":
            avg_ms = bench_arx_chain(k, samples)
        else:
            avg_ms = bench_hyperplonk(args.circuit, k, samples)
        line = f"{k}, {avg_ms:.3f}"
        print(f"{args.system}/{args.circuit}: {line}")
        with open(outfile, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
