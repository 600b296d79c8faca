"""Profile the pure-Jacobian halving MSM on the real TPU.

Usage: python scripts/profile_msm_jac.py [k ...]
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
from halo2_lasso_tpu.ops import msm_jacobian as MJ
from halo2_lasso_tpu.ops.bn254 import Fq, Fr

ks = [int(v) for v in sys.argv[1:]] or [16]
rng = np.random.RandomState(5)

for k in ks:
    n = 1 << k
    ms = [int(v) for v in rng.randint(1, 1 << 30, size=n)]
    pts = jec.fixed_base_msm(jec.g1_generator(), jnp.asarray(Fr.encode(ms)), 30)
    sc = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(n)]
    scal = jnp.asarray(Fr.encode(sc))
    pts = {kk: jnp.asarray(np.asarray(vv)) for kk, vv in pts.items()}
    r = MJ.msm(pts, scal)  # warm/compile
    _ = np.asarray(r["x"])
    best = 1e9
    for trial in range(5):
        t = time.time()
        r = MJ.msm(pts, scal)
        _ = np.asarray(r["x"]), np.asarray(r["y"]), np.asarray(r["z"])
        dt = time.time() - t
        best = min(best, dt)
        print(f"k={k}: {dt*1e3:.1f}ms -> {n/dt/1e6:.3f}M points/s", flush=True)
    print(f"k={k} BEST {best*1e3:.1f}ms -> {n/best/1e6:.3f}M points/s", flush=True)
