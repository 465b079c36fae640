"""Mixed-matrix Merkle commitment (MMCS) with Poseidon2, TPU-native.

Reimplements plonky3 ``MerkleTreeMmcs`` semantics (the commitment scheme of
the reference proof system; its verifier side is line-by-line ported in
reference extensions/native/recursion/src/fri/mod.rs:185 `verify_batch`):

  * leaf layer: rows of all TALLEST matrices concatenated, hashed with an
    overwrite-mode Poseidon2 sponge (rate 8) -> 8-element digests
  * each next layer: compress sibling digest pairs (truncated permutation);
    matrices whose height equals the layer size are "injected" by hashing
    their rows and compressing with the layer digest
  * commitment = root digest (8 BabyBear elements)

All matrix heights must be powers of two (trace heights are).  Hashing is
batched on device (openvm_tpu.poseidon2.hash_rows / compress_pairs); the tree
keeps every digest layer for later opening proofs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from . import poseidon2 as p2

DIGEST_LEN = p2.OUT


@dataclass
class MerkleTree:
    """Committed forest over matrices of mixed power-of-two heights."""

    matrices: list  # list of (N_i, W_i) jnp uint32 (monty), input order
    digest_layers: list  # [ (H, 8), (H/2, 8), ..., (1, 8) ] jnp uint32
    root: np.ndarray  # (8,) canonical uint64 (transcript form)

    def max_height(self) -> int:
        return int(self.digest_layers[0].shape[0])


def _hash_rows_multi(mats) -> jnp.ndarray:
    """Sponge over the concatenated rows of equal-height matrices."""
    joined = mats[0] if len(mats) == 1 else jnp.concatenate(mats, axis=1)
    return p2.hash_rows(joined)


def commit_layers(matrices) -> list:
    """Pure device computation of all digest layers (jit-friendly)."""
    assert matrices, "cannot commit to zero matrices"
    for m in matrices:
        h = int(m.shape[0])
        assert h & (h - 1) == 0, "matrix heights must be powers of two"

    by_height: dict[int, list] = {}
    for m in matrices:
        by_height.setdefault(int(m.shape[0]), []).append(m)

    max_h = max(by_height)
    layers = [_hash_rows_multi(by_height[max_h])]
    size = max_h
    while size > 1:
        size //= 2
        prev = layers[-1]
        next_digests = p2.compress_pairs(prev[0::2], prev[1::2])
        if size in by_height:
            injected = _hash_rows_multi(by_height[size])
            next_digests = p2.compress_pairs(next_digests, injected)
        layers.append(next_digests)
    return layers


import jax

_commit_layers_jit = jax.jit(commit_layers)


def commit(matrices) -> MerkleTree:
    """Build the Merkle tree over the given device matrices (monty form)."""
    layers = _commit_layers_jit(list(matrices))
    from .field import babybear as bb
    root = np.asarray(bb.from_monty(layers[-1][0]), dtype=np.uint64)
    return MerkleTree(matrices=list(matrices), digest_layers=layers, root=root)


def open_row(tree: MerkleTree, index: int):
    """Open all matrices at `index` (of the tallest height).

    Returns (opened_rows, proof): opened_rows[i] is matrix i's row at
    index >> (log_max - log_h_i) as canonical uint64; proof is the list of
    sibling digests from leaf layer upward, canonical uint64 (8,) each.
    """
    from .field import babybear as bb
    max_h = tree.max_height()
    log_max = max_h.bit_length() - 1

    opened = []
    for m in tree.matrices:
        h = int(m.shape[0])
        log_h = h.bit_length() - 1
        row = np.asarray(bb.from_monty(m[index >> (log_max - log_h)]),
                         dtype=np.uint64)
        opened.append(row)

    proof = []
    idx = index
    for layer in tree.digest_layers[:-1]:
        sib = np.asarray(bb.from_monty(layer[idx ^ 1]), dtype=np.uint64)
        proof.append(sib)
        idx >>= 1
    return opened, proof


_GATHER_JIT_CACHE: dict = {}


def gather_rows_device(tree: MerkleTree, indices):
    """Device-side gathers for a batched opening: all matrix rows and all
    path sibling digests at the given indices, left ON DEVICE (canonical
    form).  The caller batches the host transfer of MANY such gathers into
    one ``jax.device_get`` — each synchronous transfer on a tunneled TPU
    costs a full round-trip, and the FRI query phase makes hundreds.

    The whole gather runs as ONE jitted call per (tree shapes, q): the
    eager version dispatched one device op per matrix and per tree layer
    (~300 dispatches/prove — 2.8s of a 21.5s warm prove on the tunnel).

    Returns {"mats": [(q, w) dev], "sibs": [(q, 8) dev]}."""
    import jax
    import jax.numpy as jnp
    idx_arr = np.asarray(indices, dtype=np.int64)

    key = (tuple((tuple(m.shape), str(m.dtype)) for m in tree.matrices),
           len(tree.digest_layers), len(idx_arr))
    fn = _GATHER_JIT_CACHE.get(key)
    if fn is None:
        def run(mats, layers, idx):
            from .field import babybear as bb
            log_max = int(layers[0].shape[0]).bit_length() - 1
            mat_rows = []
            for m in mats:
                log_h = int(m.shape[0]).bit_length() - 1
                mat_rows.append(bb.from_monty(m[idx >> (log_max - log_h)]))
            sibs = []
            cur = idx
            for layer in layers[:-1]:
                sibs.append(bb.from_monty(layer[cur ^ 1]))
                cur = cur >> 1
            return {"mats": mat_rows, "sibs": sibs}

        fn = jax.jit(run)
        _GATHER_JIT_CACHE[key] = fn
    return fn(list(tree.matrices), list(tree.digest_layers),
              jnp.asarray(idx_arr))


def format_gathered_rows(gathered, q: int):
    """Host-side formatting of a fetched ``gather_rows_device`` result into
    [(opened_rows, proof)] per query, formats matching ``open_row``."""
    out = []
    for k in range(q):
        opened = [np.asarray(rows[k], dtype=np.uint64)
                  for rows in gathered["mats"]]
        proof = [np.asarray(s[k], dtype=np.uint64)
                 for s in gathered["sibs"]]
        out.append((opened, proof))
    return out


def open_rows_batch(tree: MerkleTree, indices):
    """Open all matrices + paths at several indices with one device
    round-trip for the whole batch.

    Returns [(opened_rows, proof)] in ``indices`` order, formats matching
    ``open_row``."""
    import jax
    gathered = jax.device_get(gather_rows_device(tree, indices))
    return format_gathered_rows(gathered, len(indices))


def verify_batch_queries(root: np.ndarray, dims, indices,
                         opened_rows_q, proofs_q) -> np.ndarray:
    """Vectorized `verify_batch` over a query axis.

    indices: (Q,) int array; opened_rows_q: per matrix an (Q, w) canonical
    uint64 array; proofs_q: per path level an (Q, 8) canonical uint64 array.
    Returns (Q,) bool.  Semantics identical to Q scalar `verify_batch`
    calls — used by the host verifier where the scalar path costs ~Q*depth
    Poseidon2 permutes in scalar numpy.
    """
    host = p2.Poseidon2Host()
    q = len(indices)
    idx = np.asarray(indices, dtype=np.int64)

    def hash_rows_q(rows_list):
        flat = np.concatenate([np.asarray(r, dtype=np.uint64) % p2.P
                               for r in rows_list], axis=1)  # (Q, sum_w)
        state = np.zeros((q, p2.WIDTH), dtype=np.uint64)
        for c0 in range(0, flat.shape[1], p2.RATE):
            chunk = flat[:, c0:c0 + p2.RATE]
            k = chunk.shape[1]
            state = np.concatenate([chunk, state[:, k:]], axis=1)
            state = host.permute_batch(state)
        return state[:, :DIGEST_LEN].copy()

    def compress_q(a, b):
        return host.permute_batch(
            np.concatenate([a, b], axis=1))[:, :DIGEST_LEN].copy()

    heights = [h for (h, _) in dims]
    max_h = max(heights)
    by_height: dict[int, list] = {}
    for (h, _), rows in zip(dims, opened_rows_q):
        by_height.setdefault(h, []).append(rows)

    digest = hash_rows_q(by_height[max_h])
    size = max_h
    for sib in proofs_q:
        sib = np.asarray(sib, dtype=np.uint64)
        bit = (idx & 1)[:, None] == 1
        left = np.where(bit, sib, digest)
        right = np.where(bit, digest, sib)
        digest = compress_q(left, right)
        idx >>= 1
        size //= 2
        if size in by_height:
            digest = compress_q(digest, hash_rows_q(by_height[size]))
    return np.all(digest == np.asarray(root, dtype=np.uint64)[None, :],
                  axis=1)


def verify_batch(root: np.ndarray, dims, index: int, opened_rows, proof) -> bool:
    """Host-side verification of an opened batch (canonical uint64 arrays).

    dims: list of (height, width) per matrix, same order as opened_rows.
    Mirrors the recursive verifier's `verify_batch` semantics.
    """
    host = p2.Poseidon2Host()

    def hash_row_concat(rows):
        flat = np.concatenate([np.asarray(r, dtype=np.uint64) for r in rows])
        state = np.zeros(16, dtype=np.uint64)
        for c0 in range(0, len(flat), p2.RATE):
            chunk = flat[c0:c0 + p2.RATE]
            state[:len(chunk)] = chunk
            state = host.permute(state)
        return state[:DIGEST_LEN].copy()

    def compress(a, b):
        return host.permute(np.concatenate([a, b]))[:DIGEST_LEN].copy()

    heights = [h for (h, _) in dims]
    max_h = max(heights)
    log_max = max_h.bit_length() - 1

    # group rows by height preserving order
    by_height: dict[int, list] = {}
    for (h, _), row in zip(dims, opened_rows):
        by_height.setdefault(h, []).append(row)

    digest = hash_row_concat(by_height[max_h])
    idx = index
    size = max_h
    for sib in proof:
        bit = idx & 1
        idx >>= 1
        if bit:
            digest = compress(sib, digest)
        else:
            digest = compress(digest, sib)
        size //= 2
        if size in by_height:
            digest = compress(digest, hash_row_concat(by_height[size]))
    return bool(np.array_equal(digest, np.asarray(root, dtype=np.uint64)))
