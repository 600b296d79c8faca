"""Profile the batched-affine MSM phase-by-phase on the real TPU.

Usage: python scripts/profile_msm.py [k]
Prints per-phase wall times (prologue / each level / epilogue) so we can see
whether the 2^k MSM is dominated by dispatch latency, the halving tree, or
the bucket epilogue.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo2_lasso_tpu.ops import ec as jec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops import msm_affine as MA
from halo2_lasso_tpu.ops.bn254 import Fq, Fr

k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = 1 << k
print(f"device: {jax.devices()[0]}, n = 2^{k} = {n}")

rng = np.random.RandomState(5)

t0 = time.time()
ms = [int(v) for v in rng.randint(1, 1 << 30, size=n)]
pts = jec.fixed_base_msm(jec.g1_generator(), jnp.asarray(Fr.encode(ms)), 30)
sc = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(n)]
scal_mont = jnp.asarray(Fr.encode(sc))
pts = {kk: vv.block_until_ready() for kk, vv in pts.items()}
print(f"setup: {time.time()-t0:.1f}s")

c = MA._best_c(n, Fr.num_bits)
B = 1 << c
W = -(-Fr.num_bits // c)
print(f"c={c} W={W} B={B}")


def timed(label, fn, *a):
    t = time.time()
    out = fn(*a)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    dt = time.time() - t
    print(f"  {label}: {dt*1000:.1f}ms")
    return out


for trial in range(3):
    print(f"trial {trial}:")
    t_all = time.time()
    state = timed("prologue", MA._prologue_fn(c, W, Fq, Fr), pts["x"], pts["y"], pts["z"], scal_mont)
    ax, ay, inf, dig = state
    bx = jnp.zeros((MA.L, W * B), jnp.uint32)
    by = jnp.zeros((MA.L, W * B), jnp.uint32)
    binf = jnp.ones((W * B,), dtype=bool)
    m = n
    lvl_t = time.time()
    while m > 1:
        ax, ay, inf, dig, bx, by, binf = timed(
            f"level m={m}", MA._level_fn(m, W, B, Fq), ax, ay, inf, dig, bx, by, binf
        )
        m //= 2
    print(f"  [levels total: {(time.time()-lvl_t)*1000:.1f}ms]")
    total = timed("epilogue", MA._epilogue_fn(W, B, c, Fq), ax, ay, inf, dig, bx, by, binf)
    dt = time.time() - t_all
    print(f"  TOTAL {dt*1000:.1f}ms -> {n/dt/1e6:.3f}M points/s")

# honest end-to-end: materialize the final point on the HOST (np.asarray), the
# axon tunnel's block_until_ready can return before device completion
print("end-to-end (host-materialized result):")
for trial in range(5):
    t = time.time()
    r = MA.msm_affine(pts, scal_mont)
    _ = np.asarray(r["x"]), np.asarray(r["y"]), np.asarray(r["z"])
    dt = time.time() - t
    print(f"  msm_affine: {dt*1000:.1f}ms -> {n/dt/1e6:.3f}M points/s")
