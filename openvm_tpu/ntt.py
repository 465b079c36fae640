"""Batched radix-2 NTT / coset LDE over BabyBear, TPU-native.

Operates on trace matrices of shape (N, W): the transform runs along axis 0
(rows, the evaluation domain) vectorized across all W columns — this is the
shape of the commitment pipeline (reference: Radix2DitParallel usage inside
powdr-labs/stark-backend; SURVEY.md section 2.2 / stage 1).

Conventions (mirroring plonky3 so transcripts can match):
  * ``ntt`` / ``intt``: natural order in and out, domain generator
    ``two_adic_generator(log2 N)``.
  * ``coset_lde``: input natural-order evaluations over the size-N subgroup;
    output evaluations over the shifted domain ``shift * <g_{N*blowup}>`` in
    **bit-reversed** row order (p3-fri commits LDEs bit-reversed).

All data is uint32 in Montgomery form.  Stages are expressed as reshaped
elementwise butterflies; XLA fuses the twiddle multiply chains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field import babybear as bb


@functools.lru_cache(maxsize=None)
def _twiddle_table(log_n: int, inverse: bool) -> np.ndarray:
    """Powers g^0..g^(N/2-1) of the 2^log_n root (monty form), natural order."""
    n = 1 << log_n
    g = bb.two_adic_generator_int(log_n)
    if inverse:
        g = pow(g, -1, bb.P)
    tw = np.empty(n // 2, dtype=np.uint32)
    acc = 1
    for i in range(n // 2):
        tw[i] = bb.to_monty_int(acc)
        acc = (acc * g) % bb.P
    return tw


@functools.lru_cache(maxsize=None)
def bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


def bitrev_rows(x: jnp.ndarray) -> jnp.ndarray:
    log_n = int(x.shape[0]).bit_length() - 1
    return jnp.take(x, jnp.asarray(bitrev_perm(log_n)), axis=0)


def _dif_stages(x: jnp.ndarray, log_n: int, inverse: bool) -> jnp.ndarray:
    """Decimation-in-frequency stages: natural input -> bit-reversed output."""
    n = 1 << log_n
    w = x.shape[1]
    tw_full = jnp.asarray(_twiddle_table(log_n, inverse))
    for s in range(log_n):
        half = n >> (s + 1)  # butterfly span at this stage
        blocks = 1 << s
        x = x.reshape(blocks, 2, half, w)
        a = x[:, 0]
        b = x[:, 1]
        # twiddles: g^(j * 2^s) for j in [0, half)
        tw = tw_full[:: (1 << s)][None, :, None]  # (1, half, 1)
        top = bb.add(a, b)
        bot = bb.mul(bb.sub(a, b), tw)
        x = jnp.stack([top, bot], axis=1).reshape(n, w)
    return x


@jax.jit
def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT along axis 0, natural in / natural out. x: (N, W) monty."""
    n = x.shape[0]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return x
    y = _dif_stages(x, log_n, inverse=False)
    return bitrev_rows(y)


@jax.jit
def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT along axis 0, natural in / natural out (scaled by 1/N)."""
    n = x.shape[0]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    y = _dif_stages(x, log_n, inverse=True)
    y = bitrev_rows(y)
    n_inv = jnp.asarray(np.uint32(bb.to_monty_int(pow(n, -1, bb.P))))
    return bb.mul(y, n_inv)


@functools.lru_cache(maxsize=None)
def _shift_powers(log_n: int, shift: int) -> np.ndarray:
    n = 1 << log_n
    out = np.empty(n, dtype=np.uint32)
    acc = 1
    for i in range(n):
        out[i] = bb.to_monty_int(acc)
        acc = (acc * shift) % bb.P
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def coset_lde(x: jnp.ndarray, log_blowup: int, shift: int = bb.GENERATOR,
              bitrev_out: bool = True, in_shift: int = 1,
              return_coeffs: bool = False) -> jnp.ndarray:
    """Low-degree extend columns of x onto coset shift*<g_{N<<blowup}>.

    x holds evaluations over the coset in_shift*<g_N> (natural order).
    Returns evaluations in bit-reversed row order when bitrev_out (the order
    committed to Merkle trees, mirroring p3-fri's BitReversedMatrixView).

    return_coeffs=True additionally returns the raw INTT coefficients a_i
    (natural order, monty, BEFORE the coset-shift multiply): the column
    polynomial satisfies p(z) = sum_i a_i (z / in_shift)^i — the prover's
    out-of-domain openings evaluate this dot product directly instead of
    a barycentric sum over the whole LDE.
    """
    n, w = x.shape
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n
    raw_coeffs = intt(x)
    eff_shift = (shift * pow(in_shift, -1, bb.P)) % bb.P
    coeffs = bb.mul(raw_coeffs,
                    jnp.asarray(_shift_powers(log_n, eff_shift))[:, None])
    big_n = n << log_blowup
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((big_n - n, w), dtype=jnp.uint32)], axis=0)
    big_log = log_n + log_blowup
    y = _dif_stages(padded, big_log, inverse=False)  # bit-reversed output
    if not bitrev_out:
        y = bitrev_rows(y)
    if return_coeffs:
        return y, raw_coeffs
    return y
