"""Microbench: mont_mul kernel layout variants on TPU.

A) current: (L, T) block, limb rows sliced as 1D (T,) vectors
B) 3D:      (L, S, 128) block, limb rows sliced as (S, 128) 2D arrays
            (tile-aligned: each limb row is S/8 native (8,128) VREGs)

Chained + host-synced timing. Run: python scripts/tpu_layout_bench.py [log2_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax._src import compilation_cache as _cc

_cc.zstd = None
_cc.zstandard = None
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.ops.field import LIMB_BITS, LIMB_MASK
from halo2_lasso_tpu.ops import pallas_field as PF

L = Fr.num_limbs
TILE = 1024


def mont_mul_body_generic(spec, ai, bi):
    """Schoolbook + montgomery reduce on lists of limb rows (any row shape)."""
    p_limbs = [int(v) for v in spec.p_limbs]
    npr = jnp.uint32(getattr(spec, "npr16"))
    t = [None] * (2 * L)
    for i in range(L):
        for j in range(L):
            prod = ai[i] * bi[j]
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            k = i + j
            t[k] = lo if t[k] is None else t[k] + lo
            t[k + 1] = hi if t[k + 1] is None else t[k + 1] + hi
    for i in range(L):
        carry = t[i] >> LIMB_BITS
        ti = t[i] & LIMB_MASK
        m = (ti * npr) & LIMB_MASK
        for j in range(L):
            if p_limbs[j] == 0:
                continue
            mp = m * jnp.uint32(p_limbs[j])
            lo = mp & LIMB_MASK
            hi = mp >> LIMB_BITS
            if j == 0:
                carry2 = (ti + lo) >> LIMB_BITS
                t[i + 1] = t[i + 1] + carry2
            else:
                t[i + j] = t[i + j] + lo
            t[i + j + 1] = t[i + j + 1] + hi
        t[i + 1] = t[i + 1] + carry
    r = []
    carry = jnp.zeros_like(t[L])
    for k in range(L):
        v = t[L + k] + carry
        r.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    borrow = jnp.zeros_like(r[0])
    d = []
    for k in range(L):
        v = r[k] - jnp.uint32(p_limbs[k]) - borrow
        d.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    use_d = borrow == 0
    return [jnp.where(use_d, d[k], r[k]) for k in range(L)]


def make_mul_a(n):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        out = mont_mul_body_generic(Fr, [a[i] for i in range(L)], [b[i] for i in range(L)])
        o_ref[:] = jnp.stack(out, axis=0)

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kernel,
            grid=(n // TILE,),
            in_specs=[pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        )(a, b)

    return f


def make_mul_b(n):
    S = TILE // 128

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        out = mont_mul_body_generic(Fr, [a[i] for i in range(L)], [b[i] for i in range(L)])
        o_ref[:] = jnp.stack(out, axis=0)

    @jax.jit
    def f(a, b):
        # a, b: (L, n//128, 128)
        return pl.pallas_call(
            kernel,
            grid=(n // TILE,),
            in_specs=[pl.BlockSpec((L, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((L, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, n // 128, 128), jnp.uint32),
        )(a, b)

    return f


def bench(name, f, args, iters=20):
    out = f(*args)
    _ = np.asarray(out.ravel()[:4])  # real host sync (tunnel block_until_ready lies)
    # chain: feed output back so no memoization; single TINY host sync at the
    # end (a big device->host transfer rides the slow tunnel and pollutes dt)
    t0 = time.perf_counter()
    a = args[0]
    for _i in range(iters):
        a = f(a, args[1])
    host = np.asarray(a.ravel()[:4])  # forces the whole chain to have executed
    dt = (time.perf_counter() - t0) / iters
    n = a.shape[1] * (a.shape[2] if a.ndim == 3 else 1)
    print(f"{name}: {dt*1e3:.2f} ms -> {n/dt:.3e} muls/s   [chained, host-synced]")
    return n / dt


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << k
    print("device:", jax.devices()[0], " n=2^%d" % k)
    rng = np.random.RandomState(3)
    P = Fr.modulus
    av = jnp.asarray(Fr.encode([int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]))
    bv = jnp.asarray(Fr.encode([int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]))
    a_lf = jnp.transpose(av, (1, 0))  # (L, N)
    b_lf = jnp.transpose(bv, (1, 0))
    a3 = a_lf.reshape(L, n // 128, 128)
    b3 = b_lf.reshape(L, n // 128, 128)

    fa = make_mul_a(n)
    fb = make_mul_b(n)
    ra = bench("A (L,T) rows ", fa, (a_lf, b_lf))
    rb = bench("B (L,S,128)  ", fb, (a3, b3))

    # correctness cross-check
    outa = np.asarray(fa(a_lf, b_lf))
    outb = np.asarray(fb(a3, b3)).reshape(L, n)
    assert np.array_equal(outa, outb), "layout variants disagree"
    print("variants agree; B/A speedup: %.2fx" % (rb / ra))


if __name__ == "__main__":
    main()
