"""Stage-level MSM profile: isolates (a) the pure halving-tree fused-add
chain, (b) the full level loop with bucket gather/scatter, (c) prologue,
(d) epilogue — to find where the 2^16 MSM wall-time actually goes."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo2_lasso_tpu.ops import ec as jec
from halo2_lasso_tpu.ops import msm_jacobian as MJ
from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.ops.msm_affine import _best_c, L

k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = 1 << k
rng = np.random.RandomState(5)
ms = [int(v) for v in rng.randint(1, 1 << 30, size=n)]
pts = jec.fixed_base_msm(jec.g1_generator(), jnp.asarray(Fr.encode(ms)), 30)
sc = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(n)]
scal = jnp.asarray(Fr.encode(sc))
pts = {kk: jnp.asarray(np.asarray(vv)) for kk, vv in pts.items()}

c = _best_c(n, Fr.num_bits)
B = 1 << c
W = -(-Fr.num_bits // c)
print(f"k={k} c={c} W={W} B={B}", flush=True)

def sync(x):
    # force execution but pull only 4 bytes through the tunnel
    a = x[0] if isinstance(x, tuple) else x
    return np.asarray(jnp.sum(a.astype(jnp.int32)))

# prologue
pro = MJ._prologue_fn(c, W, Fq, Fr)
x, y, z, dig = pro(pts["x"], pts["y"], pts["z"], scal)
sync(x)
t0 = time.time(); x, y, z, dig = pro(pts["x"], pts["y"], pts["z"], scal); sync(x)
print(f"prologue: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# sort probe: is the prologue argsort the wall?
from halo2_lasso_tpu.ops import field as F
@jax.jit
def sort_probe(scal):
    sc = F.from_mont(Fr, scal)
    digits = MJ._digits_all(sc, c, W)
    return jnp.argsort(-digits.astype(jnp.int32), axis=1)
o = sort_probe(scal); sync(o)
t0 = time.time(); o = sort_probe(scal); sync(o)
print(f"from_mont+digits+argsort only: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# full level loop
def levels(x, y, z, dig):
    bx = jnp.zeros((W * B, L), jnp.uint32); by = jnp.zeros_like(bx); bz = jnp.zeros_like(bx)
    m = n
    while m > 1:
        x, y, z, dig, bx, by, bz = MJ._level_fn(m, W, B, Fq)(x, y, z, dig, bx, by, bz)
        m //= 2
    return x, y, z, dig, bx, by, bz
levels(x, y, z, dig)
out = levels(x, y, z, dig); sync(out[4])
t0 = time.time(); out = levels(x, y, z, dig); sync(out[4])
print(f"full level loop: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# epilogue
xs, ys, zs, digs, bx, by, bz = out
def epi(x, y, z, dig, bx, by, bz):
    bx, by, bz = MJ._final_flush_fn(W, B, Fq)(x, y, z, dig, bx, by, bz)
    tx, ty, tz = MJ._bitplane_expand_fn(c, W, B, Fq)(bx, by, bz)
    groups = c * W
    while tx.shape[1] > groups:
        tx, ty, tz = MJ._tree_level_fn(tx.shape[1], groups, Fq)(tx, ty, tz)
    return jnp.concatenate([tx, ty, tz], axis=1)
epi(xs, ys, zs, digs, bx, by, bz)
r = epi(xs, ys, zs, digs, bx, by, bz); sync(r)
t0 = time.time(); r = epi(xs, ys, zs, digs, bx, by, bz); sync(r)
print(f"epilogue: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# end-to-end reference
r = MJ.msm(pts, scal); np.asarray(r["x"])
t0 = time.time(); r = MJ.msm(pts, scal); np.asarray(r["x"])
print(f"full msm: {(time.time()-t0)*1e3:.1f}ms", flush=True)
