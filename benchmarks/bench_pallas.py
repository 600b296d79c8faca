"""Compare the Pallas limbs-first kernels vs the XLA-fused jnp path on the
attached accelerator: mont_mul and the sumcheck fold (fix_var)."""

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

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops import pallas_field as PF
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.poly import multilinear as mle

K = int(os.environ.get("BENCH_K", "18"))
N = 1 << K
P = Fr.modulus


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    vals = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(N)]
    a_nl = jnp.asarray(Fr.encode(vals))
    b_nl = jnp.asarray(Fr.encode(list(reversed(vals))))
    a_lf = jnp.asarray(np.asarray(a_nl).T.copy())
    b_lf = jnp.asarray(np.asarray(b_nl).T.copy())
    x = jnp.asarray(Fr.encode([123456789]))[0]
    x_lf = jnp.asarray(np.asarray(x)[:, None].copy())

    jit_mul = jax.jit(lambda u, v: F.mont_mul(Fr, u, v))
    jit_fold = jax.jit(lambda e, xx: mle.fix_var(Fr, e, xx))
    pal_mul = PF.make_mont_mul(Fr)
    pal_fold = PF.make_fix_var(Fr)

    # correctness spot-check
    got = np.asarray(pal_mul(a_lf, b_lf)).T
    exp = np.asarray(jit_mul(a_nl, b_nl))
    assert np.array_equal(got, exp), "pallas mont_mul mismatch!"
    gotf = np.asarray(pal_fold(a_lf, x_lf)).T
    expf = np.asarray(jit_fold(a_nl, x))
    assert np.array_equal(gotf, expf), "pallas fix_var mismatch!"
    print("correctness OK")

    t_jnp = timeit(jit_mul, a_nl, b_nl)
    t_pal = timeit(pal_mul, a_lf, b_lf)
    print(f"mont_mul  N=2^{K}: jnp {t_jnp*1e3:8.3f}ms ({N/t_jnp/1e6:8.1f}M/s)  "
          f"pallas {t_pal*1e3:8.3f}ms ({N/t_pal/1e6:8.1f}M/s)  speedup {t_jnp/t_pal:.2f}x")

    t_jnpf = timeit(jit_fold, a_nl, x)
    t_palf = timeit(pal_fold, a_lf, x_lf)
    print(f"fix_var   N=2^{K}: jnp {t_jnpf*1e3:8.3f}ms ({N/t_jnpf/1e6:8.1f}M/s)  "
          f"pallas {t_palf*1e3:8.3f}ms ({N/t_palf/1e6:8.1f}M/s)  speedup {t_jnpf/t_palf:.2f}x")


if __name__ == "__main__":
    main()
