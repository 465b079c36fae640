"""Sparse memory Merkle tree + user public values proof."""

import numpy as np

from openvm_tpu.vm.memory_tree import (SparseMemoryTree, verify_pv_proof,
                                       _zero_digest)


def test_empty_vs_touched_roots_differ(rng):
    empty = SparseMemoryTree().root()
    t = SparseMemoryTree()
    t.write_word(2, 100, [1, 2, 3, 4])
    assert not np.array_equal(empty, t.root())
    # writing zeros back matches empty again
    t2 = SparseMemoryTree()
    t2.write_word(2, 100, [0, 0, 0, 0])
    assert np.array_equal(empty, t2.root())


def test_root_order_independence(rng):
    a = SparseMemoryTree()
    b = SparseMemoryTree()
    writes = [(1, 3, [9, 9, 9, 9]), (2, 5000, [1, 0, 0, 0]),
              (2, 5001, [2, 0, 0, 0]), (3, 0, [7, 7, 7, 7])]
    for w in writes:
        a.write_word(*w)
    for w in reversed(writes):
        b.write_word(*w)
    assert np.array_equal(a.root(), b.root())


def test_pv_proof_roundtrip(rng):
    t = SparseMemoryTree()
    t.write_word(2, 77, [5, 6, 7, 8])
    t.write_word(3, 0, [0xAA, 0xBB, 0xCC, 0xDD])
    t.write_word(3, 3, [1, 2, 3, 4])
    proof = t.pv_proof(num_pv_words=8)
    assert proof["public_values"][0] == 0xAA
    assert verify_pv_proof(proof, num_pv_words=8)
    # tampered pv fails
    proof["public_values"][0] = 0
    assert not verify_pv_proof(proof, num_pv_words=8)
