"""MSM prologue experiments (VERDICT r4 Next #4): the 2^16 MSM spends
~116ms in argsort + point gathers. Times isolated variants on-chip:

  A. current: transpose (n,L)->(L,n), take along LANE axis (axis=1)
  B. take along BATCH axis (axis=0) on (n,L), then one transpose
  C. B + fused first halving level (gather even/odd ranks separately)
  D. argsort alternatives: full -digits argsort vs sort of packed
     (digit<<17 | index) single key (one sort, order + sorted digits out)

Usage (on the TPU machine): python scripts/profile_msm_prologue.py [k]
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
from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.ops.msm_affine import _best_c, _digits_all
from halo2_lasso_tpu.ops import field as F

L = 16


def timeit(fn, *args, iters=8):
    outs = fn(*args)
    jax.block_until_ready(outs)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = fn(*args)
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main(k: int = 16) -> None:
    n = 1 << k
    rng = np.random.RandomState(5)
    ms = [int(v) for v in rng.randint(1, 1 << 30, size=n)]
    pts = ec.fixed_base_msm(ec.g1_generator(), jnp.asarray(Fr.encode(ms)), 30)
    sc = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(n)]
    scal = jnp.asarray(Fr.encode(sc))
    c = _best_c(n)
    W = (Fr.num_bits + c - 1) // c
    print(f"k={k} c={c} W={W}")

    @jax.jit
    def digits_fn(scalars_mont):
        scal_c = F.from_mont(Fr, scalars_mont)
        return _digits_all(scal_c, c, W)

    dig = digits_fn(scal)
    print("digits:", round(timeit(digits_fn, scal), 1), "ms")

    @jax.jit
    def argsort_fn(d):
        return jnp.argsort(-d.astype(jnp.int32), axis=1)

    order = argsort_fn(dig)
    print("argsort (per-window rows):", round(timeit(argsort_fn, dig), 1), "ms")

    @jax.jit
    def sort_packed_fn(d):
        key = (d.astype(jnp.uint32) << jnp.uint32(k + 1)) | jax.lax.broadcasted_iota(
            jnp.uint32, d.shape, 1
        )
        skey = jax.lax.sort(key, dimension=1, is_stable=False)
        mask = jnp.uint32((1 << (k + 1)) - 1)
        return (skey & mask)[:, ::-1], (skey >> jnp.uint32(k + 1))[:, ::-1]

    print("sort packed key (order+digits one sort):", round(timeit(sort_packed_fn, dig), 1), "ms")

    flat = order.reshape(-1)
    px, py, pz = pts["x"], pts["y"], pts["z"]

    @jax.jit
    def gather_lane(px, py, pz, flat):
        x = jnp.take(jnp.transpose(px, (1, 0)), flat, axis=1)
        y = jnp.take(jnp.transpose(py, (1, 0)), flat, axis=1)
        z = jnp.take(jnp.transpose(pz, (1, 0)), flat, axis=1)
        return x, y, z

    print("gather A (transpose->take lanes):", round(timeit(gather_lane, px, py, pz, flat), 1), "ms")

    @jax.jit
    def gather_batch(px, py, pz, flat):
        x = jnp.transpose(jnp.take(px, flat, axis=0), (1, 0))
        y = jnp.transpose(jnp.take(py, flat, axis=0), (1, 0))
        z = jnp.transpose(jnp.take(pz, flat, axis=0), (1, 0))
        return x, y, z

    print("gather B (take batch->transpose):", round(timeit(gather_batch, px, py, pz, flat), 1), "ms")

    @jax.jit
    def gather_stacked(px, py, pz, flat):
        cat = jnp.concatenate([px, py, pz], axis=1)  # (n, 3L)
        g = jnp.take(cat, flat, axis=0)  # (W*n, 3L)
        t = jnp.transpose(g, (1, 0))
        return t[:L], t[L : 2 * L], t[2 * L :]

    print("gather C (one stacked take):", round(timeit(gather_stacked, px, py, pz, flat), 1), "ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
