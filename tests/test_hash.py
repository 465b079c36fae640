"""Poseidon2 / Merkle / challenger tests."""

import numpy as np
import jax.numpy as jnp

from openvm_tpu.field import babybear as bb
from openvm_tpu import merkle, poseidon2 as p2
from openvm_tpu.challenger import DuplexChallenger

P = bb.P


def test_device_host_permute_agree(rng):
    s = rng.integers(0, P, size=(7, 16), dtype=np.uint64)
    host = p2.Poseidon2Host()
    want = np.stack([host.permute(s[i]) for i in range(7)])
    got = np.asarray(bb.from_monty(p2.permute(
        bb.to_monty(jnp.asarray(s.astype(np.uint32))))), dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_grain_constants_shape():
    assert p2.BEGIN_RC.shape == (4, 16)
    assert p2.PARTIAL_RC.shape == (13,)
    assert p2.END_RC.shape == (4, 16)
    assert (p2.BEGIN_RC < P).all() and (p2.END_RC < P).all()
    # deterministic
    again = p2.grain_round_constants()
    np.testing.assert_array_equal(again[:4], p2.BEGIN_RC)


def test_hash_rows_matches_host_sponge(rng):
    mat = rng.integers(0, P, size=(4, 11), dtype=np.uint64)
    got = np.asarray(bb.from_monty(p2.hash_rows(
        bb.to_monty(jnp.asarray(mat.astype(np.uint32))))), dtype=np.uint64)
    host = p2.Poseidon2Host()
    for i in range(4):
        state = np.zeros(16, dtype=np.uint64)
        row = mat[i]
        for c0 in range(0, 11, 8):
            chunk = row[c0:c0 + 8]
            state[:len(chunk)] = chunk
            state = host.permute(state)
        np.testing.assert_array_equal(got[i], state[:8])


def _commit(rng, heights_widths):
    mats = [bb.to_monty(jnp.asarray(
        rng.integers(0, P, size=(h, w), dtype=np.uint64).astype(np.uint32)))
        for (h, w) in heights_widths]
    return mats, merkle.commit(mats)


def test_merkle_single_matrix_roundtrip(rng):
    mats, tree = _commit(rng, [(8, 5)])
    for idx in range(8):
        opened, proof = merkle.open_row(tree, idx)
        assert merkle.verify_batch(tree.root, [(8, 5)], idx, opened, proof)
    # wrong root fails
    bad = tree.root.copy()
    bad[0] ^= 1
    opened, proof = merkle.open_row(tree, 3)
    assert not merkle.verify_batch(bad, [(8, 5)], 3, opened, proof)


def test_merkle_mixed_heights(rng):
    dims = [(16, 3), (4, 2), (16, 1), (8, 4), (1, 2)]
    mats, tree = _commit(rng, dims)
    for idx in (0, 5, 15):
        opened, proof = merkle.open_row(tree, idx)
        assert merkle.verify_batch(tree.root, dims, idx, opened, proof)
    # tamper an opened value
    opened, proof = merkle.open_row(tree, 7)
    opened[1] = (opened[1] + 1) % P
    assert not merkle.verify_batch(tree.root, dims, 7, opened, proof)


def test_challenger_determinism_and_duplex():
    a, b = DuplexChallenger(), DuplexChallenger()
    for c in (a, b):
        c.observe(5)
        c.observe_slice(np.arange(9, dtype=np.uint64))
    assert a.sample() == b.sample()
    assert a.sample_ext() == b.sample_ext()
    # sampling then observing re-duplexes: state evolves deterministically
    c1, c2 = DuplexChallenger(), DuplexChallenger()
    c1.observe(1)
    s1 = c1.sample()
    c1.observe(2)
    c2.observe(1)
    s2 = c2.sample()
    c2.observe(2)
    assert s1 == s2
    assert c1.sample() == c2.sample()


def test_grind():
    ch = DuplexChallenger()
    ch.observe(123)
    w = ch.clone().grind(4)
    check = ch.clone()
    assert check.check_witness(4, w)
