"""Sparse memory Merkle tree + leaf/pv proofs."""

import numpy as np

from openvm_tpu.vm.memory_tree import (SparseMemoryTree, pv_proof,
                                       verify_leaf, verify_pv_proof)


def test_empty_vs_touched_roots_differ():
    empty = SparseMemoryTree().root()
    t = SparseMemoryTree()
    t.write_word(2, 100, [1, 2, 3, 4])
    assert not np.array_equal(empty, t.root())
    t2 = SparseMemoryTree()
    t2.write_word(2, 100, [0, 0, 0, 0])
    assert np.array_equal(empty, t2.root())


def test_root_order_independence():
    a, b = SparseMemoryTree(), SparseMemoryTree()
    writes = [(1, 3, [9, 9, 9, 9]), (2, 5000, [1, 0, 0, 0]),
              (2, 5001, [2, 0, 0, 0]), (3, 0, [7, 7, 7, 7])]
    for w in writes:
        a.write_word(*w)
    for w in reversed(writes):
        b.write_word(*w)
    assert np.array_equal(a.root(), b.root())


def test_leaf_open_verify():
    t = SparseMemoryTree()
    t.write_word(2, 40, [1, 2, 3, 4])
    t.write_word(1, 6, [5, 6, 7, 8])
    cells, proof = t.open_leaf(2, 40)
    assert verify_leaf(t.root(), 2, 40, cells, proof)
    cells[0] ^= 1
    assert not verify_leaf(t.root(), 2, 40, cells, proof)
    # untouched leaf opens to zeros
    cells0, proof0 = t.open_leaf(2, 9000)
    assert (cells0 == 0).all()
    assert verify_leaf(t.root(), 2, 9000, cells0, proof0)


def test_pv_proof_roundtrip():
    t = SparseMemoryTree()
    t.write_word(2, 77, [5, 6, 7, 8])
    t.write_word(3, 0, [0xAA, 0xBB, 0xCC, 0xDD])
    t.write_word(3, 3, [1, 2, 3, 4])
    proof = pv_proof(t, num_pv_words=8)
    assert proof["public_values"][0] == 0xAA
    assert verify_pv_proof(proof, num_pv_words=8)
    proof["public_values"][0] = 0
    assert not verify_pv_proof(proof, num_pv_words=8)
