"""Field arithmetic tests: packed-limb Montgomery ops vs python-int ground truth.

Mirrors the reference's reliance on halo2_curves field correctness; here we
validate against exact bignum arithmetic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fr, Fq


RNG = np.random.RandomState(1234)


def rand_ints(spec, n):
    return [int.from_bytes(RNG.bytes(40), "little") % spec.modulus for _ in range(n)]


@pytest.mark.parametrize("spec", [Fr, Fq], ids=["fr", "fq"])
def test_encode_decode_roundtrip(spec):
    xs = rand_ints(spec, 8) + [0, 1, spec.modulus - 1]
    enc = spec.encode(xs)
    dec = spec.decode(enc)
    assert [int(v) for v in dec] == xs


@pytest.mark.parametrize("spec", [Fr, Fq], ids=["fr", "fq"])
def test_add_sub_neg(spec):
    xs = rand_ints(spec, 16)
    ys = rand_ints(spec, 16)
    a = jnp.asarray(spec.encode(xs))
    b = jnp.asarray(spec.encode(ys))
    got_add = spec.decode(F.add(spec, a, b))
    got_sub = spec.decode(F.sub(spec, a, b))
    got_neg = spec.decode(F.neg(spec, a))
    p = spec.modulus
    assert [int(v) for v in got_add] == [(x + y) % p for x, y in zip(xs, ys)]
    assert [int(v) for v in got_sub] == [(x - y) % p for x, y in zip(xs, ys)]
    assert [int(v) for v in got_neg] == [(-x) % p for x in xs]


@pytest.mark.parametrize("spec", [Fr, Fq], ids=["fr", "fq"])
def test_mul(spec):
    xs = rand_ints(spec, 16) + [0, 1, spec.modulus - 1, spec.modulus - 1]
    ys = rand_ints(spec, 16) + [1, 0, spec.modulus - 1, 1]
    a = jnp.asarray(spec.encode(xs))
    b = jnp.asarray(spec.encode(ys))
    got = spec.decode(F.mont_mul(spec, a, b))
    p = spec.modulus
    assert [int(v) for v in got] == [(x * y) % p for x, y in zip(xs, ys)]


def test_mont_conversions():
    spec = Fr
    xs = rand_ints(spec, 8)
    # encode gives montgomery form; from_mont gives canonical limbs
    a = jnp.asarray(spec.encode(xs))
    canon = F.from_mont(spec, a)
    back = F.to_mont(spec, canon)
    assert np.array_equal(np.asarray(back), np.asarray(a))
    for i, x in enumerate(xs):
        assert F.limbs_to_int(np.asarray(canon)[i]) == x


def test_pow_and_inv():
    spec = Fr
    xs = rand_ints(spec, 4) + [1]
    a = jnp.asarray(spec.encode(xs))
    p = spec.modulus
    got_sq = spec.decode(F.pow_fixed(spec, a, 5))
    assert [int(v) for v in got_sq] == [pow(x, 5, p) for x in xs]
    got_inv = spec.decode(F.inv(spec, a))
    assert [int(v) for v in got_inv] == [pow(x, -1, p) for x in xs]


def test_batch_inv():
    spec = Fr
    xs = rand_ints(spec, 33)
    xs[7] = 0  # zero handling
    a = jnp.asarray(spec.encode(xs))
    got = spec.decode(F.batch_inv(spec, a))
    p = spec.modulus
    expect = [pow(x, -1, p) if x != 0 else 0 for x in xs]
    assert [int(v) for v in got] == expect


def test_sum_reduce():
    spec = Fr
    n = 5000  # exercises the lazy chunked path
    xs = rand_ints(spec, n)
    a = jnp.asarray(spec.encode(xs))
    got = spec.decode(F.sum_reduce(spec, a)[None])[0]
    assert int(got) == sum(xs) % spec.modulus


def test_sum_reduce_small():
    spec = Fr
    xs = rand_ints(spec, 5)
    a = jnp.asarray(spec.encode(xs))
    got = spec.decode(F.sum_reduce(spec, a)[None])[0]
    assert int(got) == sum(xs) % spec.modulus


def test_batched_shapes():
    spec = Fr
    xs = np.array(rand_ints(spec, 12), dtype=object).reshape(3, 4)
    a = jnp.asarray(spec.encode(xs))
    assert a.shape == (3, 4, 16)
    got = spec.decode(F.mont_mul(spec, a, a))
    for i in range(3):
        for j in range(4):
            assert int(got[i, j]) == (int(xs[i, j]) ** 2) % spec.modulus
