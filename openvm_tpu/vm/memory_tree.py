"""Sparse Poseidon2 Merkle tree over guest memory (host side).

Re-design of the reference's persistent-memory commitment
(reference crates/vm/src/system/memory/merkle/{mod.rs, tree.rs} and
merkle/public_values.rs `UserPublicValuesProof`): memory is committed as a
Poseidon2 Merkle root so continuation segments can chain
(initial_root, final_root) through public values.

Layout (word-granular, matching this framework's memory argument):
  * leaf = 8 byte-cells = 2 consecutive words of one address space
  * per-address-space subtree of fixed depth; the roots of the (power-of-two
    padded) address-space list are combined into the final root
  * untouched subtrees hash to memoized all-zero digests, so cost is
    O(touched * depth)

This is the host oracle; the in-circuit MemoryMerkleChip (round 2) proves
the touched-path openings against it.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import poseidon2 as p2

P = 2013265921

# words per address space: 2^27 (pointer_max_bits 29 / word size 4)
WORD_HEIGHT = 27
LEAF_WORDS = 2  # 8 byte-cells
LEAF_HEIGHT = WORD_HEIGHT - 1  # leaves per address space = 2^26
ADDR_SPACES = (1, 2, 3, 4)


@functools.lru_cache(maxsize=None)
def _host():
    return p2.Poseidon2Host()


def _compress(left: tuple, right: tuple) -> tuple:
    state = np.zeros(16, dtype=np.uint64)
    state[:8] = left
    state[8:] = right
    return tuple(int(x) for x in _host().permute(state)[:8])


def _hash_leaf(cells8) -> tuple:
    state = np.zeros(16, dtype=np.uint64)
    state[:8] = cells8
    return tuple(int(x) for x in _host().permute(state)[:8])


@functools.lru_cache(maxsize=None)
def _zero_digest(level: int) -> tuple:
    """Digest of an all-zero subtree with 2^level leaves."""
    if level == 0:
        return _hash_leaf(np.zeros(8, dtype=np.uint64))
    child = _zero_digest(level - 1)
    return _compress(child, child)


class SparseMemoryTree:
    """Sparse Merkle commitment of {(as, word_addr): [4 bytes]} memory."""

    def __init__(self, words: dict | None = None):
        # leaves[(as, leaf_idx)] = np.array 8 cells
        self.leaves: dict = {}
        if words:
            for (a_s, wa), data in words.items():
                self.write_word(a_s, wa, data)

    def write_word(self, a_s: int, wa: int, data) -> None:
        key = (a_s, wa // LEAF_WORDS)
        leaf = self.leaves.setdefault(key, np.zeros(8, dtype=np.uint64))
        off = (wa % LEAF_WORDS) * 4
        leaf[off:off + 4] = np.asarray(data[:4], dtype=np.uint64)

    def _subtree_root(self, a_s: int) -> tuple:
        # collect touched leaves of this address space
        touched = sorted((idx, leaf) for (s, idx), leaf in self.leaves.items()
                         if s == a_s)
        if not touched:
            return _zero_digest(LEAF_HEIGHT)
        # level 0 digests
        nodes = {idx: _hash_leaf(leaf) for idx, leaf in touched}
        for level in range(LEAF_HEIGHT):
            nxt = {}
            for idx in sorted(nodes):
                pidx = idx >> 1
                if pidx in nxt:
                    continue
                left = nodes.get(pidx * 2, _zero_digest(level))
                right = nodes.get(pidx * 2 + 1, _zero_digest(level))
                nxt[pidx] = _compress(left, right)
            nodes = nxt
        return nodes[0]

    def root(self) -> np.ndarray:
        roots = [self._subtree_root(a_s) for a_s in ADDR_SPACES]
        # combine the 4 address-space roots pairwise
        l = _compress(roots[0], roots[1])
        r = _compress(roots[2], roots[3])
        return np.asarray(_compress(l, r), dtype=np.uint64)

    # -- public-values proof (reference UserPublicValuesProof) -----------
    def pv_proof(self, num_pv_words: int = 8) -> dict:
        """Merkle path for the AS3 (user public values) region.

        Returns {"public_values": bytes..., "proof": [sibling digests from
        the pv leaves up to the root], "root": root}.  num_pv_words must
        cover whole leaves (multiple of LEAF_WORDS).
        """
        assert num_pv_words % LEAF_WORDS == 0
        n_leaves = num_pv_words // LEAF_WORDS
        pvs = []
        leaf_digests = []
        for li in range(n_leaves):
            leaf = self.leaves.get((3, li), np.zeros(8, dtype=np.uint64))
            pvs.extend(int(x) for x in leaf)
            leaf_digests.append(_hash_leaf(leaf))
        # fold the pv leaves to one digest (they must form an aligned
        # power-of-two block at the start of AS3)
        assert (n_leaves & (n_leaves - 1)) == 0
        level = 0
        nodes = leaf_digests
        while len(nodes) > 1:
            nodes = [_compress(nodes[i], nodes[i + 1])
                     for i in range(0, len(nodes), 2)]
            level += 1
        pv_digest = nodes[0]

        # siblings from the pv block up to the AS3 subtree root
        proof = []
        idx = 0
        as3 = {idx_: _hash_leaf(leaf)
               for (s, idx_), leaf in self.leaves.items() if s == 3}
        # recompute level digests of AS3 with tracking
        cur = dict(as3)
        for lv in range(level):  # collapse pv-internal levels first
            nxt = {}
            for i in sorted(cur):
                pi = i >> 1
                if pi in nxt:
                    continue
                nxt[pi] = _compress(cur.get(2 * pi, _zero_digest(lv)),
                                    cur.get(2 * pi + 1, _zero_digest(lv)))
            cur = nxt
        for lv in range(level, LEAF_HEIGHT):
            sib = cur.get(idx ^ 1, _zero_digest(lv))
            proof.append(np.asarray(sib, dtype=np.uint64))
            nxt = {}
            for i in sorted(cur):
                pi = i >> 1
                if pi in nxt:
                    continue
                nxt[pi] = _compress(cur.get(2 * pi, _zero_digest(lv)),
                                    cur.get(2 * pi + 1, _zero_digest(lv)))
            cur = nxt
            idx >>= 1
        as3_root = cur.get(0, _zero_digest(LEAF_HEIGHT))
        # siblings to fold AS3 into the final root: as4 root, then (as1,as2)
        roots = {a_s: self._subtree_root(a_s) for a_s in ADDR_SPACES}
        proof.append(np.asarray(roots[4], dtype=np.uint64))
        l = _compress(roots[1], roots[2])
        proof.append(np.asarray(l, dtype=np.uint64))
        return {"public_values": pvs, "pv_digest": pv_digest,
                "proof": proof, "root": self.root()}


def verify_pv_proof(proof: dict, num_pv_words: int = 8) -> bool:
    """Check the pv block against the committed memory root."""
    pvs = np.asarray(proof["public_values"], dtype=np.uint64)
    n_leaves = num_pv_words // LEAF_WORDS
    digests = [_hash_leaf(pvs[8 * i:8 * i + 8]) for i in range(n_leaves)]
    while len(digests) > 1:
        digests = [_compress(digests[i], digests[i + 1])
                   for i in range(0, len(digests), 2)]
    node = digests[0]
    sibs = proof["proof"]
    for sib in sibs[:-2]:
        node = _compress(node, tuple(int(x) for x in sib))
    # AS3 root folded with AS4, then compressed with (AS1, AS2)
    r = _compress(node, tuple(int(x) for x in sibs[-2]))
    root = _compress(tuple(int(x) for x in sibs[-1]), r)
    return bool(np.array_equal(np.asarray(root, dtype=np.uint64),
                               proof["root"]))