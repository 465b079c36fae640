"""MemoryMerkleChip: in-circuit root transition, proven with the p2 chip."""

import os

import numpy as np
import pytest

from openvm_tpu.stark import (AirProvingContext, FriParameters, StarkConfig,
                              keygen, prove, verify)
from openvm_tpu.stark.debug import check_constraints
from openvm_tpu.stark.symbolic import Air
from openvm_tpu.vm.circuit.merkle_chip import MERKLE_BUS, MemoryMerkleAir
from openvm_tpu.vm.circuit.poseidon2_chip import Poseidon2Air
from openvm_tpu.vm.memory_tree import SparseMemoryTree, hash_leaf, leaf_index

TEST_CONFIG = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                            proof_of_work_bits=1))


class LeafRequester(Air):
    """Sends (0, leaf_idx, old_digest, new_digest) per valid row."""

    name = "leaf_requester"
    width = 19  # is_valid, idx, old8, new8 (level fixed 0)

    def eval(self, b):
        v = b.main(0)
        idx = b.main(1)
        old = [b.main(2 + i) for i in range(8)]
        new = [b.main(10 + i) for i in range(8)]
        b.assert_bool(v)
        b.push_send(MERKLE_BUS, [0, idx] + old + new, v)


def _setup(rng):
    tree = SparseMemoryTree()
    tree.write_word(2, 10, [1, 2, 3, 4])
    tree.write_word(1, 0, [9, 8, 7, 6])

    # updates: change one existing leaf, touch one new leaf
    updates_cells = {
        (2, 10): [5, 5, 5, 5],
        (3, 0): [0xAB, 0, 0, 1],
    }
    leaf_updates = {}
    for (a_s, wa), cells in updates_cells.items():
        li = leaf_index(a_s, wa)
        old_cells = tree.leaves.get(li, np.zeros(8, dtype=np.uint64)).copy()
        new_cells = old_cells.copy()
        new_cells[(wa % 2) * 4:(wa % 2) * 4 + 4] = cells
        leaf_updates[li] = (hash_leaf(old_cells), hash_leaf(new_cells))

    chip = MemoryMerkleAir()
    trace, init_root, final_root = chip.trace(leaf_updates, tree)

    # post-update host tree must agree with the chip's final root
    for (a_s, wa), cells in updates_cells.items():
        tree.write_word(a_s, wa, cells)
    assert np.array_equal(np.asarray(final_root), tree.root())
    return chip, trace, leaf_updates, init_root, final_root


def test_merkle_chip_roots_and_constraints(rng):
    chip, trace, leaf_updates, init_root, final_root = _setup(rng)
    p2chip = Poseidon2Air()
    req = LeafRequester()
    pk = keygen([chip, p2chip, req], TEST_CONFIG)

    p2_trace = p2chip.trace(chip.p2_requests(trace))
    req_trace = np.zeros((2, 19), dtype=np.uint64)
    for r, (li, (old, new)) in enumerate(sorted(leaf_updates.items())):
        req_trace[r, 0] = 1
        req_trace[r, 1] = li
        req_trace[r, 2:10] = old
        req_trace[r, 10:18] = new

    pvs = [int(x) for x in init_root] + [int(x) for x in final_root]
    ctxs = [
        AirProvingContext(air_id=0, common_main=trace, public_values=pvs),
        AirProvingContext(air_id=1, common_main=p2_trace),
        AirProvingContext(air_id=2, common_main=req_trace),
    ]
    check_constraints(pk, ctxs)  # logical + bus balance

    if os.environ.get("OPENVM_SLOW"):
        proof = prove(pk, ctxs)
        verify(pk.vk, proof)


def test_merkle_chip_wrong_root_fails(rng):
    chip, trace, leaf_updates, init_root, final_root = _setup(rng)
    p2chip = Poseidon2Air()
    req = LeafRequester()
    pk = keygen([chip, p2chip, req], TEST_CONFIG)
    p2_trace = p2chip.trace(chip.p2_requests(trace))
    req_trace = np.zeros((2, 19), dtype=np.uint64)
    for r, (li, (old, new)) in enumerate(sorted(leaf_updates.items())):
        req_trace[r, 0] = 1
        req_trace[r, 1] = li
        req_trace[r, 2:10] = old
        req_trace[r, 10:18] = new
    bad_pvs = [int(x) for x in init_root] + [int(x) for x in final_root]
    bad_pvs[0] = (bad_pvs[0] + 1) % (2**31)
    ctxs = [
        AirProvingContext(air_id=0, common_main=trace,
                          public_values=bad_pvs),
        AirProvingContext(air_id=1, common_main=p2_trace),
        AirProvingContext(air_id=2, common_main=req_trace),
    ]
    fails = check_constraints(pk, ctxs, raise_on_error=False)
    assert fails
