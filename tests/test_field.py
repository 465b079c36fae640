"""BabyBear field + quartic extension: correctness vs python bigint model."""

import numpy as np
import jax.numpy as jnp

from openvm_tpu.field import babybear as bb
from openvm_tpu.field import ext

P = bb.P


def rand_canonical(rng, shape):
    return rng.integers(0, P, size=shape, dtype=np.uint64).astype(np.uint32)


def test_constants():
    assert P == 2013265921
    assert (P - 1) % (1 << 27) == 0
    # 31 generates: its order is p-1 (check via prime factors 2 and 3,5 of 15)
    for q in (2, 3, 5):
        assert pow(31, (P - 1) // q, P) != 1
    # NPRIME: p * p^{-1} = -1 mod 2^32
    assert (P * ((-bb.NPRIME) % (1 << 32))) % (1 << 32) == 1


def test_monty_roundtrip(rng):
    x = rand_canonical(rng, (1000,))
    m = bb.to_monty(jnp.asarray(x))
    back = np.asarray(bb.from_monty(m))
    np.testing.assert_array_equal(back, x)


def test_mul_add_sub(rng):
    a = rand_canonical(rng, (2048,))
    b = rand_canonical(rng, (2048,))
    am = bb.to_monty(jnp.asarray(a))
    bm = bb.to_monty(jnp.asarray(b))
    got_mul = np.asarray(bb.from_monty(bb.mul(am, bm)), dtype=np.uint64)
    want_mul = (a.astype(np.uint64) * b.astype(np.uint64)) % P
    np.testing.assert_array_equal(got_mul, want_mul)

    got_add = np.asarray(bb.from_monty(bb.add(am, bm)), dtype=np.uint64)
    np.testing.assert_array_equal(got_add,
                                  (a.astype(np.uint64) + b) % P)
    got_sub = np.asarray(bb.from_monty(bb.sub(am, bm)), dtype=np.uint64)
    np.testing.assert_array_equal(got_sub,
                                  (a.astype(np.uint64) + P - b) % P)
    got_neg = np.asarray(bb.from_monty(bb.neg(am)), dtype=np.uint64)
    np.testing.assert_array_equal(got_neg, (P - a.astype(np.uint64)) % P)


def test_edge_values():
    vals = np.array([0, 1, P - 1, P // 2, P // 2 + 1], dtype=np.uint32)
    m = bb.to_monty(jnp.asarray(vals))
    sq = np.asarray(bb.from_monty(bb.mul(m, m)), dtype=np.uint64)
    want = (vals.astype(np.uint64) ** 2) % P
    np.testing.assert_array_equal(sq, want)


def test_inv(rng):
    a = rand_canonical(rng, (256,))
    a[a == 0] = 1
    am = bb.to_monty(jnp.asarray(a))
    prod = bb.from_monty(bb.mul(am, bb.inv(am)))
    np.testing.assert_array_equal(np.asarray(prod), np.ones_like(a))


def test_batch_inv(rng):
    a = rand_canonical(rng, (300,))
    a[::7] = 0  # zeros map to zero
    am = bb.to_monty(jnp.asarray(a))
    binv = bb.batch_inv(am)
    fermat = bb.inv(am)
    np.testing.assert_array_equal(np.asarray(binv), np.asarray(fermat))


def test_sum_and_dot(rng):
    a = rand_canonical(rng, (7, 100))
    b = rand_canonical(rng, (7, 100))
    am = bb.to_monty(jnp.asarray(a))
    bm = bb.to_monty(jnp.asarray(b))
    got = np.asarray(bb.from_monty(bb.dot(am, bm, axis=-1)), dtype=np.uint64)
    want = (a.astype(object) * b.astype(object)).sum(axis=-1) % P
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_two_adic_generator():
    g27 = bb.two_adic_generator_int(27)
    assert pow(g27, 1 << 27, P) == 1
    assert pow(g27, 1 << 26, P) != 1
    assert bb.two_adic_generator_int(0) == 1
    assert bb.two_adic_generator_int(1) == P - 1


# ----------------------------- extension field -----------------------------

def ext_mul_model(a, b):
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + int(a[i]) * int(b[j])) % P
    return [(c[k] + ext.W * c[k + 4]) % P if k < 3 else c[k]
            for k in range(4)]


def test_ext_mul(rng):
    a = rand_canonical(rng, (50, 4))
    b = rand_canonical(rng, (50, 4))
    am = bb.to_monty(jnp.asarray(a))
    bm = bb.to_monty(jnp.asarray(b))
    got = np.asarray(bb.from_monty(ext.mul(am, bm)))
    for i in range(50):
        assert list(got[i]) == ext_mul_model(a[i], b[i])


def test_ext_mul_associative_commutative(rng):
    a = bb.to_monty(jnp.asarray(rand_canonical(rng, (20, 4))))
    b = bb.to_monty(jnp.asarray(rand_canonical(rng, (20, 4))))
    c = bb.to_monty(jnp.asarray(rand_canonical(rng, (20, 4))))
    lhs = ext.mul(ext.mul(a, b), c)
    rhs = ext.mul(a, ext.mul(b, c))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))
    np.testing.assert_array_equal(np.asarray(ext.mul(a, b)),
                                  np.asarray(ext.mul(b, a)))


def test_ext_inv(rng):
    a = rand_canonical(rng, (30, 4))
    a[0] = [5, 0, 0, 0]  # base-field element
    am = bb.to_monty(jnp.asarray(a))
    prod = ext.mul(am, ext.inv(am))
    one = np.zeros((30, 4), dtype=np.uint64)
    one[:, 0] = 1
    np.testing.assert_array_equal(
        np.asarray(bb.from_monty(prod), dtype=np.uint64), one)


def test_ext_frobenius_is_pth_power(rng):
    a = bb.to_monty(jnp.asarray(rand_canonical(rng, (4, 4))))
    f = ext.frobenius(a, 1)
    pth = ext.exp_u64(a, P)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(pth))


def test_ext_embed_base(rng):
    a = rand_canonical(rng, (10,))
    b = rand_canonical(rng, (10,))
    am = bb.to_monty(jnp.asarray(a))
    bm = bb.to_monty(jnp.asarray(b))
    lhs = ext.mul(ext.from_base(am), ext.from_base(bm))
    want = np.zeros((10, 4), dtype=np.uint64)
    want[:, 0] = (a.astype(np.uint64) * b.astype(np.uint64)) % P
    np.testing.assert_array_equal(
        np.asarray(bb.from_monty(lhs), dtype=np.uint64), want)
