"""TPU validation + microbench of the Pallas MSM vs the portable jnp path.

Run on the axon TPU machine: python scripts/tpu_msm_check.py [log2_n ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax._src import compilation_cache as _cc

_cc.zstd = None
_cc.zstandard = None
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import jax.numpy as jnp

from halo2_lasso_tpu.ops import ec, field as F, pallas_ec
from halo2_lasso_tpu.ops.bn254 import Fr


def main():
    ks = [int(a) for a in sys.argv[1:]] or [12, 14]
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(42)
    for k in ks:
        n = 1 << k
        # random points: [m_i] G via fixed-base windowed mul (30-bit multipliers)
        ms = rng.randint(1, 1 << 30, size=n).astype(np.uint64)
        msc = jnp.asarray(Fr.encode([int(v) for v in ms]))
        pts = ec.fixed_base_msm(ec.g1_generator(), msc, 30)
        scalars = jnp.asarray(
            Fr.encode(
                [int.from_bytes(rng.bytes(32), "little") % Fr.modulus for _ in range(n)]
            )
        )

        # correctness: pallas vs jnp pippenger
        t0 = time.time()
        r_pallas = pallas_ec.msm_pallas(pts, scalars)
        aff_p = ec.jacobian_to_affine({kk: v[None] for kk, v in r_pallas.items()})
        t_first = time.time() - t0
        scal_can = F.from_mont(Fr, scalars)
        r_jnp = ec._msm_impl(pts, scal_can, 16)
        aff_j = ec.jacobian_to_affine({kk: v[None] for kk, v in r_jnp.items()})
        ok = aff_p[0][0] == aff_j[0][0] and aff_p[0][1] == aff_j[0][1]
        print(f"k={k}: pallas==jnp: {ok} (first call incl compile {t_first:.1f}s)")
        if not ok:
            print("  pallas:", aff_p[0][0])
            print("  jnp:   ", aff_j[0][0])
            sys.exit(1)

        # perf: warm timing with host sync
        for _ in range(2):
            r = pallas_ec.msm_pallas(pts, scalars)
            jax.block_until_ready(r["x"])
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            r = pallas_ec.msm_pallas(pts, scalars)
            jax.block_until_ready(r["x"])
        dt = (time.time() - t0) / iters
        print(f"k={k}: msm_pallas {dt*1e3:.1f} ms -> {n/dt:.3e} points/s")

        t0 = time.time()
        for _ in range(iters):
            r = ec._msm_impl(pts, scal_can, 16)
            jax.block_until_ready(r["x"])
        dt = (time.time() - t0) / iters
        print(f"k={k}: jnp msm    {dt*1e3:.1f} ms -> {n/dt:.3e} points/s")

        # batched-affine MSM: correctness + warm timing
        from halo2_lasso_tpu.ops import msm_affine

        t0 = time.time()
        r_aff = msm_affine.msm_affine(pts, scalars)
        aff_a = ec.jacobian_to_affine({kk: v[None] for kk, v in r_aff.items()})
        t_first = time.time() - t0
        ok = aff_a[0][0] == aff_j[0][0] and aff_a[0][1] == aff_j[0][1]
        print(f"k={k}: affine==jnp: {ok} (first call incl compile {t_first:.1f}s)")
        if not ok:
            sys.exit(1)
        for _ in range(2):
            r = msm_affine.msm_affine(pts, scalars)
            jax.block_until_ready(r["x"])
        t0 = time.time()
        for _ in range(iters):
            r = msm_affine.msm_affine(pts, scalars)
            jax.block_until_ready(r["x"])
        dt = (time.time() - t0) / iters
        print(f"k={k}: msm_affine {dt*1e3:.1f} ms -> {n/dt:.3e} points/s")


if __name__ == "__main__":
    main()
