"""NTT / coset LDE vs naive DFT model."""

import numpy as np
import jax.numpy as jnp

from openvm_tpu.field import babybear as bb
from openvm_tpu import ntt

P = bb.P


def naive_dft(x_cols, g):
    """x_cols: (N, W) python ints; returns DFT along axis 0."""
    n, w = x_cols.shape
    out = np.zeros_like(x_cols, dtype=object)
    gp = [pow(g, i, P) for i in range(n)]
    for k in range(n):
        acc = np.zeros(w, dtype=object)
        for j in range(n):
            acc = (acc + x_cols[j] * gp[(j * k) % n]) % P
        out[k] = acc
    return out


def test_ntt_matches_naive(rng):
    log_n = 4
    n = 1 << log_n
    x = rng.integers(0, P, size=(n, 3), dtype=np.uint64)
    xm = bb.to_monty(jnp.asarray(x.astype(np.uint32)))
    got = np.asarray(bb.from_monty(ntt.ntt(xm)), dtype=np.uint64)
    g = bb.two_adic_generator_int(log_n)
    want = naive_dft(x.astype(object), g).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_intt_inverts(rng):
    for log_n in (0, 1, 5, 8):
        n = 1 << log_n
        x = rng.integers(0, P, size=(n, 2), dtype=np.uint64).astype(np.uint32)
        xm = bb.to_monty(jnp.asarray(x))
        rt = np.asarray(bb.from_monty(ntt.intt(ntt.ntt(xm))))
        np.testing.assert_array_equal(rt, x)


def test_coset_lde_agrees_with_poly_eval(rng):
    log_n, log_blowup = 3, 1
    n = 1 << log_n
    x = rng.integers(0, P, size=(n, 2), dtype=np.uint64)
    xm = bb.to_monty(jnp.asarray(x.astype(np.uint32)))
    lde = ntt.coset_lde(xm, log_blowup, bitrev_out=False)
    got = np.asarray(bb.from_monty(lde), dtype=np.uint64)

    # model: interpolate poly over subgroup H=<g_n>, evaluate at shift*g_big^k
    g_n = bb.two_adic_generator_int(log_n)
    g_big = bb.two_adic_generator_int(log_n + log_blowup)
    shift = bb.GENERATOR
    # coefficients via naive inverse DFT
    coeffs = naive_dft(x.astype(object), pow(g_n, -1, P))
    n_inv = pow(n, -1, P)
    coeffs = (coeffs * n_inv) % P
    for k in range(n << log_blowup):
        pt = (shift * pow(g_big, k, P)) % P
        val = 0
        for j in range(n):
            val = (val + int(coeffs[j][0]) * pow(pt, j, P)) % P
        assert got[k][0] == val


def test_coset_lde_bitrev_order(rng):
    log_n, log_blowup = 3, 1
    n = 1 << log_n
    x = rng.integers(0, P, size=(n, 1), dtype=np.uint64).astype(np.uint32)
    xm = bb.to_monty(jnp.asarray(x))
    nat = np.asarray(ntt.coset_lde(xm, log_blowup, bitrev_out=False))
    rev = np.asarray(ntt.coset_lde(xm, log_blowup, bitrev_out=True))
    perm = ntt.bitrev_perm(log_n + log_blowup)
    np.testing.assert_array_equal(rev, nat[perm])


def test_lde_restricts_to_original_on_trivial_shift(rng):
    # With shift=1 the LDE domain contains H interleaved; check values agree.
    log_n, log_blowup = 4, 1
    n = 1 << log_n
    x = rng.integers(0, P, size=(n, 2), dtype=np.uint64).astype(np.uint32)
    xm = bb.to_monty(jnp.asarray(x))
    lde = np.asarray(ntt.coset_lde(xm, log_blowup, shift=1, bitrev_out=False))
    # g_big^2 = g_n, so lde[2k] = x[k]
    np.testing.assert_array_equal(lde[::2], np.asarray(xm))
