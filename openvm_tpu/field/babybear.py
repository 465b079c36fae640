"""BabyBear prime field arithmetic, TPU-native.

The field is F_p with p = 2^31 - 2^27 + 1 = 2013265921 (two-adicity 27), the
base field of the reference proof system (see reference Cargo.toml:211-221,
p3-baby-bear pin).  All device arithmetic is vectorized JAX uint32 with
Montgomery representation (R = 2^32), mirroring plonky3's ``MontyField31``
layout so that trace/proof serialization (canonical u32 values) matches.

TPU has no native 64-bit integer multiply, so the 32x32->64 products required
by Montgomery reduction are synthesized from 16x16->32 partial products that
are exact in uint32 lanes.  These elementwise chains fuse well under XLA.

Reference parity: replaces the Rust ``p3_baby_bear`` usage inside
``powdr-labs/stark-backend`` (pinned via /root/reference/Cargo.toml:116-120).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Field constants
# ---------------------------------------------------------------------------

P = 2013265921  # 2^31 - 2^27 + 1
TWO_ADICITY = 27
GENERATOR = 31  # multiplicative generator of F_p^* (matches plonky3)

_R = 1 << 32
R_MOD_P = _R % P  # Montgomery form of 1
R2_MOD_P = (_R * _R) % P  # used to convert into Montgomery form
# -p^{-1} mod 2^32 (Montgomery constant "nprime")
NPRIME = (-pow(P, -1, _R)) % _R

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def _u32(x: int) -> jnp.ndarray:
    return jnp.asarray(np.uint32(x), dtype=_U32)


# ---------------------------------------------------------------------------
# Host-side (python int) helpers, used for constants and tests
# ---------------------------------------------------------------------------

def to_monty_int(x: int) -> int:
    return (x * _R) % P


def from_monty_int(x: int) -> int:
    return (x * pow(_R, -1, P)) % P


def exp_int(base: int, e: int) -> int:
    return pow(base, e, P)


def inv_int(x: int) -> int:
    return pow(x, -1, P)


def ext_mul_int(x: tuple, y: tuple) -> tuple:
    """Quartic-extension product in canonical ints, F_p[w]/(w^4 - 11)."""
    out = [0, 0, 0, 0]
    for i in range(4):
        for j in range(4):
            k = i + j
            t = x[i] * y[j]
            if k < 4:
                out[k] += t
            else:
                out[k - 4] += 11 * t
    return tuple(v % P for v in out)


def ext_inv_int(x: tuple) -> tuple:
    """Quartic-extension inverse via the norm to the base field:
    conj2(a) = a(w -> -w); N2 = a * conj2(a) lies in F_p[w^2];
    then one more norm step down to F_p."""
    a0, a1, a2, a3 = (int(v) % P for v in x)
    # b = a * conj(a) where conj negates odd coefficients -> even only
    b0 = (a0 * a0 - 11 * (2 * a1 * a3 - a2 * a2)) % P
    b2 = (2 * a0 * a2 - a1 * a1 - 11 * a3 * a3) % P
    # c = b * conj'(b) with conj'(w^2 -> -w^2): c = b0^2 - 11*b2^2 in F_p
    c = (b0 * b0 - 11 * b2 * b2) % P
    cinv = pow(c, -1, P)
    # a^{-1} = conj(a) * conj'(b) * c^{-1}
    d0, d2 = (b0 * cinv) % P, (-b2 * cinv) % P
    # e = conj(a) = (a0, -a1, a2, -a3); result = e * (d0 + d2 w^2)
    e = (a0, (-a1) % P, a2, (-a3) % P)
    return ext_mul_int(e, (d0, 0, d2, 0))


def two_adic_generator_int(bits: int) -> int:
    """Canonical 2^bits-th root of unity: g^((p-1)/2^bits) with g=31.

    Matches p3_baby_bear two-adic generator derivation.
    """
    assert 0 <= bits <= TWO_ADICITY
    return pow(GENERATOR, (P - 1) >> bits, P)


# ---------------------------------------------------------------------------
# Vectorized uint32 primitives
# ---------------------------------------------------------------------------

def mul_32x32(a: jnp.ndarray, b: jnp.ndarray):
    """Full 32x32 -> (hi, lo) uint32 product via exact 16-bit partials."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo = a0 * b0
    m1 = a0 * b1
    m2 = a1 * b0
    hi = a1 * b1
    mid = m1 + m2  # may wrap
    mid_carry = (mid < m1).astype(_U32)
    hi = hi + (mid_carry << 16)
    lo2 = lo + ((mid & _MASK16) << 16)  # may wrap
    lo_carry = (lo2 < lo).astype(_U32)
    hi = hi + (mid >> 16) + lo_carry
    return hi, lo2


def _monty_reduce(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of a 64-bit value (hi*2^32 + lo) < p*2^32."""
    m = lo * _u32(NPRIME)  # wrapping low-32 product
    mp_hi, _ = mul_32x32(m, _u32(P))
    carry = (lo != 0).astype(_U32)
    t = hi + mp_hi + carry
    return jnp.where(t >= _u32(P), t - _u32(P), t)


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: mul(aR, bR) = abR (mod p).

    Always the exact 16-bit-limb path.  A uint64 fast path (active under
    jax_enable_x64 on CPU) existed through round 2 but was removed: this
    XLA:CPU build miscompiles the u64 chain NONDETERMINISTICALLY (same
    jitted function, same input, different results across calls) — the
    round-2 real-ELF proving failure and bench flakiness traced to it.
    TPU has no native u64 anyway, so the limb path is the only one that
    can ship.
    """
    hi, lo = mul_32x32(a, b)
    return _monty_reduce(hi, lo)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = a + b  # < 2p < 2^32, no wrap
    return jnp.where(s >= _u32(P), s - _u32(P), s)


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a - b  # wraps when b > a
    return jnp.where(a >= b, d, d + _u32(P))


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(a == 0, a, _u32(P) - a)


@jax.jit
def to_monty(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical u32 in [0, p) -> Montgomery form."""
    return mul(x.astype(_U32), _u32(R2_MOD_P))


@jax.jit
def from_monty(x: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical u32 in [0, p)."""
    return _monty_reduce(jnp.zeros_like(x), x)


def monty(x) -> jnp.ndarray:
    """Host ints/array -> device array in Montgomery form."""
    arr = np.asarray(x, dtype=np.uint64) % P
    return to_monty(jnp.asarray(arr.astype(np.uint32)))


def zeros(shape) -> jnp.ndarray:
    return jnp.zeros(shape, dtype=_U32)


def ones(shape) -> jnp.ndarray:
    return jnp.full(shape, np.uint32(R_MOD_P), dtype=_U32)


def full(shape, value: int) -> jnp.ndarray:
    return jnp.full(shape, np.uint32(to_monty_int(value % P)), dtype=_U32)


@functools.partial(jax.jit, static_argnums=1)
def exp_u64(base: jnp.ndarray, e: int) -> jnp.ndarray:
    """base^e for a static python exponent.

    Short exponents unroll; long ones run as a lax.scan over the bit string
    (compile-time matters: the unrolled 31-bit Fermat-inverse chain shows up
    inside many jitted pipelines).
    """
    if e < (1 << 8):
        result = ones(base.shape)
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

    (result, _), _ = jax.lax.scan(body, (ones(base.shape), base), bits)
    return result


@jax.jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Batch inverse via Fermat: a^(p-2). 0 maps to 0."""
    return exp_u64(a, P - 2)


@jax.jit
def batch_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion (1 field inv + 3n muls) along flat array."""
    flat = a.reshape(-1)
    n = flat.shape[0]
    # prefix products; protect zeros by substituting 1 (monty) then fixing up
    safe = jnp.where(flat == 0, ones(flat.shape), flat)

    def scan_fn(carry, x):
        nxt = mul(carry, x)
        return nxt, carry

    total, prefix = jax.lax.scan(scan_fn, ones(()), safe)
    total_inv = inv(total)

    def scan_back(carry, xs):
        x, pre = xs
        out = mul(carry, pre)
        nxt = mul(carry, x)
        return nxt, out

    _, out = jax.lax.scan(scan_back, total_inv, (safe, prefix), reverse=True)
    out = jnp.where(flat == 0, jnp.zeros_like(flat), out)
    return out.reshape(a.shape)


# ---------------------------------------------------------------------------
# Sums / dot products (hot path of quotient + LogUp)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=1)
def sum_mod(a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Modular sum along an axis via log-depth tree of modular adds."""
    n = a.shape[axis]
    while n > 1:
        half = n // 2
        lo_idx = [slice(None)] * a.ndim
        hi_idx = [slice(None)] * a.ndim
        rem_idx = [slice(None)] * a.ndim
        lo_idx[axis] = slice(0, half)
        hi_idx[axis] = slice(half, 2 * half)
        rem_idx[axis] = slice(2 * half, n)
        folded = add(a[tuple(lo_idx)], a[tuple(hi_idx)])
        a = jnp.concatenate([folded, a[tuple(rem_idx)]], axis=axis)
        n = a.shape[axis]
    sq = [slice(None)] * a.ndim
    sq[axis] = 0
    return a[tuple(sq)]


@functools.partial(jax.jit, static_argnums=2)
def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sum_i a_i * b_i mod p along an axis (both in Montgomery form)."""
    return sum_mod(mul(a, b), axis=axis)
