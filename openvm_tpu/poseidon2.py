"""Poseidon2 permutation (width 16, BabyBear), TPU-native + host reference.

Parameters mirror the reference exactly (reference
crates/circuits/poseidon2-air/src/lib.rs:37-44): WIDTH=16, 8 external rounds
(4 beginning + 4 ending), 13 internal rounds, S-box x^7.  The linear layers
are the plonky3 `mds_light_permutation` (M4 blocks + column sums) and the
BabyBear internal diagonal layer (sum + diag*state), matching the reference's
CUDA implementation (crates/circuits/poseidon2-air/cuda/include/poseidon2-air/
linearlayer.cuh) and p3_baby_bear::INTERNAL_DIAG_MONTY.

Round constants: the reference consumes the Horizen Labs ``zkhash`` BabyBear
instance (crates/circuits/poseidon2-air/src/babybear.rs:20-45, RC16), which is
generated with the published Grain-LFSR procedure from the Poseidon paper.  We
re-derive them here with the same procedure (`grain_round_constants`); they are
also overridable via `set_round_constants` for byte-exact cross-checking
against the Rust prover when its vectors are available.

Two implementations, tested equal:
  * `permute(states)`: batched JAX (monty uint32, shape (..., 16)) — device.
  * `Poseidon2Host.permute(state)`: numpy uint64 canonical — host challenger.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field import babybear as bb

WIDTH = 16
RATE = 8
OUT = 8
HALF_FULL_ROUNDS = 4
PARTIAL_ROUNDS = 13
SBOX_DEGREE = 7

P = bb.P

# BabyBear internal-layer diagonal (plonky3 p3-baby-bear INTERNAL_DIAG_MONTY):
# [-2, 1, 2, 1/2, 3, 4, -1/2, -3, -4, 1/2^8, 1/4, 1/8, 1/2^27, -1/2^8, -1/16,
#  -1/2^27]
def _frac(num: int, den: int) -> int:
    return (num * pow(den, -1, P)) % P

INTERNAL_DIAG = np.array([
    P - 2, 1, 2, _frac(1, 2), 3, 4, _frac(-1, 2), P - 3, P - 4,
    _frac(1, 1 << 8), _frac(1, 4), _frac(1, 8), _frac(1, 1 << 27),
    _frac(-1, 1 << 8), _frac(-1, 16), _frac(-1, 1 << 27),
], dtype=np.uint64)


# ---------------------------------------------------------------------------
# Grain LFSR round-constant derivation (Poseidon paper, appendix F; the same
# procedure behind the zkhash/HorizenLabs BabyBear instance the reference uses)
# ---------------------------------------------------------------------------

def grain_round_constants(p: int = P, t: int = WIDTH,
                          r_f: int = 2 * HALF_FULL_ROUNDS,
                          r_p: int = PARTIAL_ROUNDS) -> np.ndarray:
    """(r_f + r_p, t) canonical round constants via the Grain LFSR."""
    n = p.bit_length()  # 31 for BabyBear
    bits = []
    for val, width in ((1, 2), (0, 4), (n, 12), (t, 12), (r_f, 10), (r_p, 10)):
        bits.extend(int(b) for b in bin(val)[2:].zfill(width))
    bits.extend([1] * 30)
    assert len(bits) == 80
    state = bits

    def next_raw_bit():
        new = (state[62] ^ state[51] ^ state[38] ^ state[23] ^ state[13]
               ^ state[0])
        state.pop(0)
        state.append(new)
        return new

    for _ in range(160):
        next_raw_bit()

    def next_bit():
        # shrinking generator: first bit selects, second is the output
        while True:
            b1 = next_raw_bit()
            b2 = next_raw_bit()
            if b1 == 1:
                return b2

    def next_field_element():
        while True:
            v = 0
            for _ in range(n):
                v = (v << 1) | next_bit()
            if v < p:
                return v

    out = np.empty((r_f + r_p, t), dtype=np.uint64)
    for r in range(r_f + r_p):
        for i in range(t):
            out[r, i] = next_field_element()
    return out


# Round-constant storage (canonical u64).  Layout matches the reference's
# Poseidon2Constants: beginning full | partial | ending full.
_RC_ALL = grain_round_constants()
BEGIN_RC = _RC_ALL[:HALF_FULL_ROUNDS]                       # (4, 16)
PARTIAL_RC = _RC_ALL[HALF_FULL_ROUNDS:
                     HALF_FULL_ROUNDS + PARTIAL_ROUNDS][:, 0]  # (13,)
END_RC = _RC_ALL[HALF_FULL_ROUNDS + PARTIAL_ROUNDS:]        # (4, 16)


def set_round_constants(begin_rc, partial_rc, end_rc) -> None:
    """Override round constants (canonical ints) e.g. with zkhash RC16 dumps."""
    global BEGIN_RC, PARTIAL_RC, END_RC, _DEVICE_RC
    BEGIN_RC = np.asarray(begin_rc, dtype=np.uint64) % P
    PARTIAL_RC = np.asarray(partial_rc, dtype=np.uint64) % P
    END_RC = np.asarray(end_rc, dtype=np.uint64) % P
    assert BEGIN_RC.shape == (HALF_FULL_ROUNDS, WIDTH)
    assert PARTIAL_RC.shape == (PARTIAL_ROUNDS,)
    assert END_RC.shape == (HALF_FULL_ROUNDS, WIDTH)
    _DEVICE_RC.cache_clear()
    _permute_jit.cache_clear()


# ---------------------------------------------------------------------------
# Device (JAX, monty form) implementation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _DEVICE_RC():
    """Monty-form round constants as *numpy* arrays (safe to cache across
    jit traces; jnp constants created under trace would leak tracers)."""
    to_m = np.vectorize(bb.to_monty_int, otypes=[np.uint32])
    return (to_m(BEGIN_RC), to_m(PARTIAL_RC), to_m(END_RC),
            to_m(INTERNAL_DIAG))


def _sbox(x):
    x2 = bb.mul(x, x)
    x3 = bb.mul(x2, x)
    return bb.mul(bb.mul(x3, x3), x)


def _mat4(x):
    """plonky3 MDSMat4 applied to 4 lanes: x shape (..., 4)."""
    x0, x1, x2, x3 = (x[..., i] for i in range(4))
    t01 = bb.add(x0, x1)
    t23 = bb.add(x2, x3)
    t0123 = bb.add(t01, t23)
    t01123 = bb.add(t0123, x1)
    t01233 = bb.add(t0123, x3)
    y3 = bb.add(t01233, bb.add(x0, x0))
    y1 = bb.add(t01123, bb.add(x2, x2))
    y0 = bb.add(t01123, t01)
    y2 = bb.add(t01233, t23)
    return jnp.stack([y0, y1, y2, y3], axis=-1)


def _external_linear(state):
    """mds_light_permutation for width 16: state (..., 16)."""
    s = state.reshape(state.shape[:-1] + (4, 4))
    s = _mat4(s)
    sums = bb.sum_mod(s, axis=-2)  # (..., 4): column sums over the 4 blocks
    s = bb.add(s, sums[..., None, :])
    return s.reshape(state.shape)


def _internal_linear(state, diag):
    full_sum = bb.sum_mod(state, axis=-1)
    return bb.add(bb.mul(state, diag), full_sum[..., None])


def _permute_impl(state: jnp.ndarray) -> jnp.ndarray:
    # Rounds run as lax.scan over the round-constant arrays: ~7x smaller XLA
    # graphs than fully unrolled (compile time matters — the Merkle pipeline
    # inlines one permute per tree layer).
    begin_rc, partial_rc, end_rc, diag = (
        jnp.asarray(a) for a in _DEVICE_RC())
    state = _external_linear(state)

    def full_round(s, rc):
        s = bb.add(s, rc)
        s = _sbox(s)
        return _external_linear(s), None

    def partial_round(s, rc):
        s0 = _sbox(bb.add(s[..., 0], rc))
        s = jnp.concatenate([s0[..., None], s[..., 1:]], axis=-1)
        return _internal_linear(s, diag), None

    state, _ = jax.lax.scan(full_round, state, begin_rc)
    state, _ = jax.lax.scan(partial_round, state, partial_rc)
    state, _ = jax.lax.scan(full_round, state, end_rc)
    return state


@functools.lru_cache(maxsize=None)
def _permute_jit():
    return jax.jit(_permute_impl)


def permute(state: jnp.ndarray) -> jnp.ndarray:
    """Batched Poseidon2: state (..., 16) uint32 monty -> same shape."""
    return _permute_jit()(state)


# ---------------------------------------------------------------------------
# Hash helpers (device, batched over rows)
# ---------------------------------------------------------------------------

def hash_rows(matrix: jnp.ndarray) -> jnp.ndarray:
    """PaddingFreeSponge over each row: (N, W) monty -> (N, 8) digests.

    Overwrite-mode sponge, rate 8, exactly p3_symmetric::PaddingFreeSponge:
    state starts zero; each 8-wide chunk of the row overwrites state[:8]
    (last chunk may be short), then permute; output = state[:8].
    """
    n, w = matrix.shape
    state = jnp.zeros((n, WIDTH), dtype=jnp.uint32)
    for c0 in range(0, w, RATE):
        chunk = matrix[:, c0:c0 + RATE]
        k = chunk.shape[1]
        state = jnp.concatenate([chunk, state[:, k:]], axis=1)
        state = permute(state)
    return state[:, :OUT]


def compress_pairs(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """TruncatedPermutation 2-to-1: (N, 8)+(N, 8) -> (N, 8)."""
    state = jnp.concatenate([left, right], axis=1)
    return permute(state)[:, :OUT]


# ---------------------------------------------------------------------------
# Host (numpy canonical) implementation — used by the Fiat-Shamir challenger
# ---------------------------------------------------------------------------

class Poseidon2Host:
    """Single-state permutation on canonical uint64 numpy arrays."""

    def __init__(self):
        self.begin_rc = BEGIN_RC.astype(np.uint64)
        self.partial_rc = PARTIAL_RC.astype(np.uint64)
        self.end_rc = END_RC.astype(np.uint64)
        self.diag = INTERNAL_DIAG.astype(np.uint64)

    @staticmethod
    def _sbox(x):
        x2 = (x * x) % P
        x3 = (x2 * x) % P
        return (x3 * x3 % P) * x % P

    @staticmethod
    def _external(state):
        s = state.reshape(4, 4).copy()
        x0, x1, x2, x3 = s[:, 0].copy(), s[:, 1].copy(), s[:, 2].copy(), s[:, 3].copy()
        t01 = (x0 + x1) % P
        t23 = (x2 + x3) % P
        t0123 = (t01 + t23) % P
        t01123 = (t0123 + x1) % P
        t01233 = (t0123 + x3) % P
        s[:, 3] = (t01233 + 2 * x0) % P
        s[:, 1] = (t01123 + 2 * x2) % P
        s[:, 0] = (t01123 + t01) % P
        s[:, 2] = (t01233 + t23) % P
        sums = s.sum(axis=0) % P
        s = (s + sums) % P
        return s.reshape(16)

    def permute(self, state: np.ndarray) -> np.ndarray:
        state = state.astype(np.uint64) % P
        state = self._external(state)
        for r in range(HALF_FULL_ROUNDS):
            state = (state + self.begin_rc[r]) % P
            state = self._sbox(state)
            state = self._external(state)
        for r in range(PARTIAL_ROUNDS):
            state[0] = self._sbox((state[0] + self.partial_rc[r]) % P)
            full = state.sum() % P
            state = (state * self.diag + full) % P
        for r in range(HALF_FULL_ROUNDS):
            state = (state + self.end_rc[r]) % P
            state = self._sbox(state)
            state = self._external(state)
        return state

    @staticmethod
    def _external_batch(states):
        """mds_light_permutation over (B, 16) canonical uint64."""
        s = states.reshape(-1, 4, 4).copy()
        x0, x1, x2, x3 = (s[:, :, i].copy() for i in range(4))
        t01 = (x0 + x1) % P
        t23 = (x2 + x3) % P
        t0123 = (t01 + t23) % P
        t01123 = (t0123 + x1) % P
        t01233 = (t0123 + x3) % P
        s[:, :, 3] = (t01233 + 2 * x0) % P
        s[:, :, 1] = (t01123 + 2 * x2) % P
        s[:, :, 0] = (t01123 + t01) % P
        s[:, :, 2] = (t01233 + t23) % P
        sums = s.sum(axis=1) % P  # (B, 4)
        s = (s + sums[:, None, :]) % P
        return s.reshape(-1, 16)

    def permute_batch(self, states: np.ndarray) -> np.ndarray:
        """Batched permutation over (B, 16) canonical uint64 arrays.

        Vectorizes the Fiat-Shamir grind and batched host verification:
        ~100x the throughput of the scalar path (the scalar `permute`
        stays as the single-state reference)."""
        s = states.astype(np.uint64) % P
        s = self._external_batch(s)
        for r in range(HALF_FULL_ROUNDS):
            s = self._sbox((s + self.begin_rc[r]) % P)
            s = self._external_batch(s)
        for r in range(PARTIAL_ROUNDS):
            s[:, 0] = self._sbox((s[:, 0] + self.partial_rc[r]) % P)
            full = s.sum(axis=1) % P
            s = (s * self.diag + full[:, None]) % P
        for r in range(HALF_FULL_ROUNDS):
            s = self._sbox((s + self.end_rc[r]) % P)
            s = self._external_batch(s)
        return s
