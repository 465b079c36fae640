"""Quartic binomial extension field F_p[x]/(x^4 - W) over BabyBear, W = 11.

Matches plonky3's ``BinomialExtensionField<BabyBear, 4>`` (the challenge field
of the reference proof system; see SURVEY.md section 2.2).  Elements are JAX
uint32 arrays in Montgomery form whose *trailing* axis has length 4
(coefficients a0 + a1 x + a2 x^2 + a3 x^3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import babybear as bb

D = 4
W = 11  # x^4 - 11 irreducible over BabyBear (p3_baby_bear BinomiallyExtendable)

_W_MONTY = np.uint32(bb.to_monty_int(W))

# Frobenius scale factors: x^(p^k) = W^(k*(p-1)/4) * x
_FROB_BASE = bb.exp_int(W, (bb.P - 1) // 4)


def _frob_consts(k: int) -> np.ndarray:
    """[W^(i*k*(p-1)/4) for i in range(4)] in Montgomery form."""
    s = bb.exp_int(_FROB_BASE, k)
    return np.array([bb.to_monty_int(pow(s, i, bb.P)) for i in range(4)],
                    dtype=np.uint32)


def from_base(a: jnp.ndarray) -> jnp.ndarray:
    """Embed base-field array (monty) into the extension (append zeros)."""
    z = jnp.zeros(a.shape + (D - 1,), dtype=jnp.uint32)
    return jnp.concatenate([a[..., None], z], axis=-1)


def zeros(shape) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (D,), dtype=jnp.uint32)


def ones(shape) -> jnp.ndarray:
    return from_base(bb.ones(shape))


def monty(coeffs) -> jnp.ndarray:
    """Host list/array of 4 canonical ints -> monty device array (..., 4)."""
    return bb.monty(np.asarray(coeffs))


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return bb.add(a, b)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return bb.sub(a, b)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return bb.neg(a)


def scale(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Multiply extension element(s) by base-field scalar(s) (broadcast)."""
    return bb.mul(a, c[..., None])


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 4x4 product with x^4 -> W reduction."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = bb.mul
    w = jnp.asarray(_W_MONTY)

    # c_k = sum_{i+j=k} a_i b_j  (k = 0..6), then fold c_{4+k} by W into c_k
    c0 = m(a0, b0)
    c1 = bb.add(m(a0, b1), m(a1, b0))
    c2 = bb.add(bb.add(m(a0, b2), m(a1, b1)), m(a2, b0))
    c3 = bb.add(bb.add(m(a0, b3), m(a1, b2)), bb.add(m(a2, b1), m(a3, b0)))
    c4 = bb.add(bb.add(m(a1, b3), m(a2, b2)), m(a3, b1))
    c5 = bb.add(m(a2, b3), m(a3, b2))
    c6 = m(a3, b3)

    r0 = bb.add(c0, m(c4, w))
    r1 = bb.add(c1, m(c5, w))
    r2 = bb.add(c2, m(c6, w))
    r3 = c3
    return jnp.stack([r0, r1, r2, r3], axis=-1)


def mul_base(a: jnp.ndarray, b_base: jnp.ndarray) -> jnp.ndarray:
    return scale(a, b_base)


def frobenius(a: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """a^(p^k): coefficient-wise scale by W^(i*k*(p-1)/4)."""
    consts = jnp.asarray(_frob_consts(k % 4))
    return bb.mul(a, consts)


@jax.jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse via norm: a^{-1} = (a^p a^{p^2} a^{p^3}) / N(a), N(a) in F_p."""
    f1 = frobenius(a, 1)
    f2 = frobenius(a, 2)
    f3 = frobenius(a, 3)
    g = mul(f1, mul(f2, f3))
    norm_full = mul(a, g)  # lies in base field: coeffs 1..3 are zero
    norm = norm_full[..., 0]
    ninv = bb.inv(norm)
    return scale(g, ninv)


@functools.partial(jax.jit, static_argnums=1)
def exp_u64(a: jnp.ndarray, e: int) -> jnp.ndarray:
    # unroll only short or pure-squaring exponents; scan otherwise (XLA:CPU
    # compile time explodes on some unrolled square-and-multiply shapes)
    if e < (1 << 8) or (e & (e - 1)) == 0:
        result = ones(a.shape[:-1])
        base = a
        while e > 0:
            if e & 1:
                result = mul(result, base)
            base = mul(base, base)
            e >>= 1
        return result

    bits = jnp.asarray(np.array([(e >> i) & 1 for i in range(e.bit_length())],
                                dtype=np.uint32))

    def body(carry, bit):
        acc, b = carry
        acc = jnp.where(bit != 0, mul(acc, b), acc)
        return (acc, mul(b, b)), None

    (result, _), _ = jax.lax.scan(body, (ones(a.shape[:-1]), a), bits)
    return result


def sum_mod(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Modular sum of extension elements along a (non-trailing) axis."""
    if axis < 0:
        axis -= 1  # account for the coefficient axis
    return bb.sum_mod(a, axis=axis)


def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    return sum_mod(mul(a, b), axis=axis)
