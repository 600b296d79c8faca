"""Per-phase cost of a single quotient-shaped MSM (the KZG open wall).

The batch open spends ~3.25s in 16 per-size pipelines; this isolates where
one pipeline's time goes at a given size (warm, single process):
prologue / levels / epilogue trees (device, each synced) and the
decode + _finish_host recombination (host), plus the _msm_small
double-and-add scan at raised sizes (candidate replacement for the small
quotients).

Usage (TPU machine): python scripts/profile_quotient_msm.py [sizes...]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax._src import compilation_cache as _cc

_cc.zstd = None
_cc.zstandard = None
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

from halo2_lasso_tpu.ops import ec
from halo2_lasso_tpu.ops import msm_jacobian as MJ
from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.msm_affine import _best_c


def t_sync(label, fn, iters=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {label}: {min(ts)*1e3:.1f}ms")
    return out


def profile_size(n: int) -> None:
    print(f"== n={n}")
    rng = np.random.RandomState(5)
    ms = [int(v) for v in rng.randint(1, 1 << 30, size=n)]
    pts = ec.fixed_base_msm(ec.g1_generator(), jnp.asarray(Fr.encode(ms)), 30)
    sc = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(n)]
    scal = jnp.asarray(Fr.encode(sc))

    c = _best_c(n, Fr.num_bits)
    B = 1 << c
    W = -(-Fr.num_bits // c)
    L = MJ.L

    prol = MJ._prologue_fn(c, W, Fq, Fr)
    x, y, z, dig = t_sync(
        "prologue", lambda: prol(pts["x"], pts["y"], pts["z"], scal)
    )

    def levels():
        bx = jnp.zeros((L, W * B), jnp.uint32)
        by = jnp.zeros((L, W * B), jnp.uint32)
        bz = jnp.zeros((L, W * B), jnp.uint32)
        xx, yy, zz, dd = x, y, z, dig
        m = n
        while m > 1:
            xx, yy, zz, dd, bx, by, bz = MJ._level_fn(m, W, B, Fq)(
                xx, yy, zz, dd, bx, by, bz
            )
            m //= 2
        return MJ._final_flush_fn(W, B, Fq)(xx, yy, zz, dd, bx, by, bz)

    bx, by, bz = t_sync("levels+flush", levels)

    def epilogue():
        tx, ty, tz = MJ._bitplane_expand_fn(c, W, B, Fq)(bx, by, bz)
        groups = c * W
        while tx.shape[1] > groups:
            tx, ty, tz = MJ._tree_level_fn(tx.shape[1], groups, Fq)(tx, ty, tz)
        return jnp.concatenate([tx, ty, tz], axis=1)

    tcat = t_sync("bitplane+tree", epilogue)

    t0 = time.perf_counter()
    raw = np.asarray(tcat)
    print(f"  partials pull: {(time.perf_counter()-t0)*1e3:.1f}ms  shape {raw.shape}")
    t0 = time.perf_counter()
    all_u = Fq.decode(raw.T)
    print(f"  decode: {(time.perf_counter()-t0)*1e3:.1f}ms")
    t0 = time.perf_counter()
    MJ._finish_host(all_u, c, W, Fq.modulus)
    print(f"  finish_host: {(time.perf_counter()-t0)*1e3:.1f}ms")

    # candidate replacement for small sizes: vectorized double-and-add
    if n <= 8192:
        scal_c = F.from_mont(Fr, scal)
        t_sync(
            "msm_small scan", lambda: ec._msm_small(pts, scal_c[None], Fq, Fr.num_bits)
        )


def seg_experiment(n_pad: int, S: int) -> None:
    """Compile + run one segmented pipeline (S x n_pad) and time it — the
    go/no-go check for enabling quotient grouping on this stack."""
    print(f"== seg S={S} n_pad={n_pad}")
    rng = np.random.RandomState(5)
    jobs = []
    for s in range(S):
        n = n_pad >> s
        ms = [int(v) for v in rng.randint(1, 1 << 30, size=n)]
        pts = ec.fixed_base_msm(ec.g1_generator(), jnp.asarray(Fr.encode(ms)), 30)
        sc = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(n)]
        jobs.append((pts, jnp.asarray(Fr.encode(sc))))
    t0 = time.perf_counter()
    tcat, c, W = MJ._device_partials_seg(jobs, Fq, Fr, n_pad)
    jax.block_until_ready(tcat)
    print(f"  first run (incl compile): {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        tcat, c, W = MJ._device_partials_seg(jobs, Fq, Fr, n_pad)
        jax.block_until_ready(tcat)
        ts.append(time.perf_counter() - t0)
    print(f"  warm: {min(ts)*1e3:.1f}ms")
    all_u = Fq.decode(np.asarray(tcat).T)
    segs = MJ._finish_host_segments(all_u, c, W, S, Fq.modulus)
    for (pts, scal), got in zip(jobs, segs):
        ref = ec.msm_to_affine_int(pts, scal)
        aff = MJ._host_batch_affine([got], Fq.modulus)[0]
        assert (int(aff[0]), int(aff[1])) == ref, "seg mismatch"
    print("  results match per-job MSMs")


if __name__ == "__main__":
    if sys.argv[1:] and sys.argv[1] == "seg":
        seg_experiment(int(sys.argv[2]) if len(sys.argv) > 2 else 8192,
                       int(sys.argv[3]) if len(sys.argv) > 3 else 2)
    else:
        sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096, 32768]
        for n in sizes:
            profile_size(n)
