"""Test configuration: force CPU platform with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (mirrors the driver's dryrun setup).

Set HALO2_LASSO_TPU_TPU_TESTS=1 to keep the real accelerator visible instead
(for tests/test_pallas_tpu.py on the TPU machine; everything else in the
suite still passes there, just slower through the device tunnel)."""

import os
import sys

# XLA:CPU's ORC JIT allocates three anonymous mappings per compiled function;
# a HyperPlonk+Lasso prove at nv>=5 crosses the default vm.max_map_count
# (65530) mid-compile and LLVM dies with "Cannot allocate memory" followed by
# a segfault/abort. Raise the limit when the environment permits (root
# container); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1_048_576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass

_TPU_MODE = os.environ.get("HALO2_LASSO_TPU_TPU_TESTS", "0") == "1"

# run the suite with prover-internal debug assertions on (the reference's
# `sanity-check` feature is enabled for its tests too); CI sizes are tiny,
# the extra host syncs are noise there
os.environ.setdefault("HALO2_LASSO_TPU_SANITY", "1")

if not _TPU_MODE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # pin the CPU target ISA: this jaxlib otherwise compiles executables with
    # pseudo-features (+prefer-no-scatter/-gather) the AOT loader rejects,
    # which intermittently SIGILL/aborts when (re)loading compiled code
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
if "parallel_codegen" not in flags:
    # XLA:CPU's parallel codegen intermittently segfaults on the very large
    # fused sumcheck-round modules; compile single-split
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force CPU
# through the config so tests never pay the device-tunnel latency.
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

# Big-field limb graphs are expensive to compile; cache compilations across
# test runs (first run pays, later runs are instant).
# NOTE: deliberately a DIFFERENT cache dir from bench.py/TPU runs: executables
# compiled by the axon-attached processes carry different CPU target features
# and abort/SIGILL when loaded by the plain-CPU test processes.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    ".jax_cache_tpu" if _TPU_MODE else ".jax_cache_cpu",
)
if os.environ.get("HALO2_LASSO_TPU_NO_CACHE", "0") != "1":
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# XLA's internal per-kernel AOT caches are the source of the
# machine-feature-mismatch loader warnings and intermittent segfaults/aborts
# during big compiles on this image; keep only the jax-level executable cache.
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

# the zstandard backend of the compilation cache segfaults intermittently on
# this image; force the zlib fallback (cache entries are then zlib-framed)
from jax._src import compilation_cache as _cc  # noqa: E402

_cc.zstd = None
_cc.zstandard = None

# STABILITY: this jaxlib's CPU backend deterministically segfaults when
# SERIALIZING very large executables for the persistent cache (the biggest
# hyperplonk round functions), and occasionally when compiling them in long
# sessions. Mitigations: don't persist those modules (below), and keep the
# per-module size down (the sumcheck round function is split per eval point).
_orig_put = _cc.put_executable_and_time


def _safe_put(cache_key, module_name, executable, backend, compile_time):
    if any(tag in module_name for tag in ("round_eval", "round_fn", "chunk_fn", "fold_fn")):
        return
    if compile_time > 5.0:
        # serialization of large executables is what segfaults; compile time
        # is the only size proxy available before serializing
        return
    return _orig_put(cache_key, module_name, executable, backend, compile_time)


_cc.put_executable_and_time = _safe_put

# Long single-process runs (the full suite) accumulate dozens of large CPU
# executables; this jaxlib then deterministically segfaults DESERIALIZING a
# (standalone-fine) persistent-cache entry ~35 tests in. Dropping live
# executables between test modules keeps the process off that cliff; the
# persistent cache makes re-loads cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()


# The e2e backend tests compile the most (every nv is a fresh shape set);
# within one module the module fixture never fires, and the BIG_TESTS sweep
# (nv 8..12) still hits the cliff mid-module. Clear after every test there.
_HEAVY = ("test_hyperplonk", "test_lasso", "test_hyperplonk_pcs")


@pytest.fixture(autouse=True)
def _clear_jax_caches_heavy(request):
    yield
    if any(request.node.nodeid.startswith(f"tests/{m}") for m in _HEAVY):
        jax.clear_caches()
