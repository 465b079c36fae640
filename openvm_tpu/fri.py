"""FRI low-degree commitment: device-side commit/fold phase + host verify.

Implements the exact protocol pinned by the reference's recursive verifier
(reference extensions/native/recursion/src/fri/mod.rs `verify_query` and
two_adic_pcs.rs `verify_two_adic_pcs`):

  * inputs: per-LDE-height "reduced opening" polynomials (extension valued,
    rows in bit-reversed order over the coset g*<w_H>)
  * fold step i (height H -> H/2): commit the pair matrix (H/2, 2 ext) =
    rows [v[2j], v[2j+1]] (8 base columns after flattening), observe commit,
    sample beta, fold v'[j] = interpolate{(y_j, v[2j]), (-y_j, v[2j+1])}(beta)
    with y_j = w_H^{rev_{H/2}(j)}; then v' += beta^2 * ro[log(H/2)]
  * after log_max_height folds the values are constant: final_poly (len 1)
  * PoW grind, then per query: sample index bits, open input trees + each
    pair tree at the query path
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .field import babybear as bb
from .field import ext as ef
from . import merkle, ntt


@dataclass
class CommitPhaseStep:
    sibling_value: tuple  # ext as 4 canonical ints
    opening_proof: list  # list of (8,) canonical digests


@dataclass
class QueryProof:
    input_proof: list  # list[BatchOpening] (one per round)
    commit_phase_openings: list  # list[CommitPhaseStep]


@dataclass
class BatchOpening:
    opened_values: list  # per matrix: list of canonical ints (the row)
    opening_proof: list  # sibling digests


@dataclass
class FriProof:
    commit_phase_commits: list  # list[(8,) canonical digest]
    query_proofs: list
    final_poly: list  # [ext 4-tuple]
    pow_witness: int


@functools.lru_cache(maxsize=None)
def _fold_xs(log_h: int) -> np.ndarray:
    """y_j = w_H^{rev_{H/2}(j)} for j < H/2, canonical -> monty np array."""
    h = 1 << log_h
    half = h // 2
    w = bb.two_adic_generator_int(log_h)
    pows = np.empty(half, dtype=np.uint32)
    acc = 1
    for j in range(half):
        pows[j] = bb.to_monty_int(acc)
        acc = (acc * w) % bb.P
    if log_h >= 2:
        perm = ntt.bitrev_perm(log_h - 1)
        pows = pows[perm]
    return pows


import jax


@jax.jit
def fold_evals(evals: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """One fold: evals (H, 4) ext monty bitrev order -> (H/2, 4).

    v'[j] = v0 + (beta - y_j)(v1 - v0)/(-2 y_j), matching the verifier's
    interpolation eval_0 + (beta - xs_0)(eval_1 - eval_0)/(xs_1 - xs_0)
    with xs_1 = -xs_0 = -y_j.
    """
    h = evals.shape[0]
    log_h = h.bit_length() - 1
    v0 = evals[0::2]
    v1 = evals[1::2]
    y = jnp.asarray(_fold_xs(log_h))  # (H/2,) base monty
    diff = ef.sub(v1, v0)
    # denominator xs_1 - xs_0 = -2y  (base field)
    denom_inv = bb.inv(bb.neg(bb.add(y, y)))
    slope = ef.scale(diff, denom_inv)
    bmy = ef.sub(jnp.broadcast_to(beta, v0.shape), ef.from_base(y))
    return ef.add(v0, ef.mul(bmy, slope))


def ext_to_base_cols(evals: jnp.ndarray) -> jnp.ndarray:
    """(H, 4) ext -> (H, 4) base matrix (coefficient columns) — identity
    layout; pairs matrix builder below flattens (H/2, 2, 4) -> (H/2, 8)."""
    return evals


def commit_phase(ro_polys: dict, log_max_lde: int, log_blowup: int,
                 challenger) -> tuple:
    """Run the FRI commit phase.

    ro_polys: {log_height: (2^log_height, 4) ext monty bitrev arrays}
    Returns (commit_phase_trees, betas, final_poly_ct, evals_per_step)
    where evals_per_step[i] is the input array at fold step i (for queries).
    """
    current = ro_polys[log_max_lde]
    trees = []
    betas = []
    evals_per_step = []
    log_h = log_max_lde
    while log_h > log_blowup:
        evals_per_step.append(current)
        h = 1 << log_h
        pairs = current.reshape(h // 2, 8)  # (v[2j] || v[2j+1]) flattened
        tree = merkle.commit([pairs])
        trees.append(tree)
        challenger.observe_slice(tree.root)
        beta_c = challenger.sample_ext()
        beta = bb.to_monty(jnp.asarray(
            np.asarray(beta_c, dtype=np.uint64).astype(np.uint32)))
        betas.append(beta)
        current = fold_evals(current, beta)
        log_h -= 1
        if log_h in ro_polys and log_h > log_blowup - 1:
            beta_sq = ef.mul(beta, beta)
            current = ef.add(current, ef.mul(
                jnp.broadcast_to(beta_sq, current.shape), ro_polys[log_h]))
    # current has height 2^log_blowup and should be constant
    final_host = np.asarray(bb.from_monty(current), dtype=np.uint64)
    assert all(np.array_equal(final_host[0], r) for r in final_host), \
        "FRI final polynomial is not constant — constraints unsatisfied?"
    final_poly_ct = tuple(int(x) for x in final_host[0])
    return trees, betas, final_poly_ct, evals_per_step


def answer_query(index: int, trees: list, evals_per_step: list) -> list:
    """Produce commit-phase openings for one query index."""
    steps = []
    for i, (tree, evals) in enumerate(zip(trees, evals_per_step)):
        idx_level = index >> i
        sib = np.asarray(bb.from_monty(evals[idx_level ^ 1]), dtype=np.uint64)
        _, proof = merkle.open_row(tree, idx_level >> 1)
        steps.append(CommitPhaseStep(
            sibling_value=tuple(int(x) for x in sib),
            opening_proof=proof))
    return steps


def gather_queries_device(indices, trees: list, evals_per_step: list):
    """Device-side gathers for all commit-phase query openings: per fold
    level, the sibling values and the pair-tree opening paths, left on
    device for a single batched host transfer (see
    merkle.gather_rows_device)."""
    import jax.numpy as jnp
    idx_arr = np.asarray(indices, dtype=np.int64)
    per_level = []
    for i, (tree, evals) in enumerate(zip(trees, evals_per_step)):
        lvl = idx_arr >> i
        sibs = bb.from_monty(evals[jnp.asarray(lvl ^ 1)])  # (q, 4) dev
        paths = merkle.gather_rows_device(tree, list(lvl >> 1))
        per_level.append({"sibs": sibs, "paths": paths})
    return per_level


def format_gathered_queries(per_level, q: int):
    """Host-side formatting of fetched gather_queries_device results into
    steps_per_query[qi] = [CommitPhaseStep per fold level]."""
    paths = [merkle.format_gathered_rows(lv["paths"], q) for lv in per_level]
    return [[CommitPhaseStep(
        sibling_value=tuple(int(x) for x in per_level[i]["sibs"][qi]),
        opening_proof=paths[i][qi][1])
        for i in range(len(per_level))] for qi in range(q)]


def answer_queries_batch(indices, trees: list, evals_per_step: list):
    """answer_query for several indices with one device round-trip.

    Returns steps_per_query[qi] = [CommitPhaseStep per fold level]."""
    import jax
    per_level = jax.device_get(
        gather_queries_device(indices, trees, evals_per_step))
    return format_gathered_queries(per_level, len(indices))


# ---------------------------------------------------------------------------
# Host-side verification helpers (canonical ints)
# ---------------------------------------------------------------------------

def verify_queries_host(config, commit_phase_commits, indices,
                        steps_per_query, betas, reduced_openings,
                        log_max_lde: int, final_poly_ct) -> np.ndarray:
    """Vectorized `verify_query_host` over all queries at once.

    indices: (Q,) ints; steps_per_query[qi][i] = CommitPhaseStep;
    reduced_openings: {log_height: (Q, 4) canonical uint64}.
    Returns (Q,) bool, identical per-query semantics to the scalar path.
    """
    from .stark import npext as nx
    q = len(indices)
    # malformed-proof guard: every query must carry exactly one
    # commit-phase step per fold level; a truncated or padded proof
    # otherwise turns into an IndexError/ValueError deep in the numpy
    # paths instead of a clean rejection
    if any(len(steps_per_query[k]) != len(commit_phase_commits)
           for k in range(q)):
        return np.zeros(q, dtype=bool)
    idx_arr = np.asarray(indices, dtype=np.int64)
    folded = np.asarray(reduced_openings[log_max_lde], dtype=np.uint64) % bb.P
    ok = np.ones(q, dtype=bool)

    for i, (commit, beta) in enumerate(zip(commit_phase_commits, betas)):
        log_folded = log_max_lde - i - 1
        idx_level = idx_arr >> i
        bit = (idx_level & 1)[:, None] == 1
        sibs = np.asarray([steps_per_query[k][i].sibling_value
                           for k in range(q)], dtype=np.uint64)  # (Q, 4)
        e0 = np.where(bit, sibs, folded)
        e1 = np.where(bit, folded, sibs)

        rows = np.concatenate([e0, e1], axis=1)  # (Q, 8)
        depth = max(log_folded, 0)
        if any(len(steps_per_query[k][i].opening_proof) != depth
               for k in range(q)):
            return np.zeros(q, dtype=bool)  # malformed path length
        proofs_q = [np.asarray([steps_per_query[k][i].opening_proof[lv]
                                for k in range(q)], dtype=np.uint64)
                    for lv in range(depth)]
        ok &= merkle.verify_batch_queries(
            np.asarray(commit, dtype=np.uint64),
            [(1 << log_folded, 8)], idx_level >> 1, [rows], proofs_q)

        w = bb.two_adic_generator_int(log_folded + 1)
        if log_folded > 0:
            rev = nx.rev_bits_arr(idx_level >> 1, log_folded)
            y0 = nx.npow_base_varexp(w, rev)  # (Q,)
        else:
            y0 = np.ones(q, dtype=np.uint64)
        xs0 = nx.from_base(y0)
        xs1 = nx.from_base((bb.P - y0) % bb.P)
        beta_b = np.asarray(beta, dtype=np.uint64)[None, :] % bb.P
        num = nx.nmul(nx.nsub(np.broadcast_to(beta_b, (q, 4)), xs0),
                      nx.nsub(e1, e0))
        folded = nx.nadd(e0, nx.nmul(num, nx.ninv(nx.nsub(xs1, xs0))))
        ro = reduced_openings.get(log_folded)
        if ro is not None:
            beta_sq = nx.nmul(beta_b, beta_b)
            folded = nx.nadd(folded, nx.nmul(
                np.broadcast_to(beta_sq, (q, 4)),
                np.asarray(ro, dtype=np.uint64) % bb.P))
    ok &= np.all(folded == np.asarray(final_poly_ct,
                                      dtype=np.uint64)[None, :], axis=1)
    return ok


def verify_query_host(config, commit_phase_commits, index: int,
                      commit_phase_openings, betas, reduced_openings,
                      log_max_lde: int, final_poly_ct) -> bool:
    """Mirror of the reference verify_query (fri/mod.rs:32-170)."""
    from .stark.evaluator import hadd, hmul, hsub, base, hinv

    folded = reduced_openings[log_max_lde]
    for i, (commit, step, beta) in enumerate(
            zip(commit_phase_commits, commit_phase_openings, betas)):
        log_folded = log_max_lde - i - 1
        idx_level = index >> i
        bit = idx_level & 1
        evals = [None, None]
        evals[bit] = folded
        evals[1 - bit] = step.sibling_value

        # verify pair-matrix opening
        row = [c for v in evals for c in v]  # 8 canonical ints
        ok = merkle.verify_batch(
            np.asarray(commit, dtype=np.uint64),
            [(1 << log_folded, 8)], idx_level >> 1,
            [np.asarray(row, dtype=np.uint64)], step.opening_proof)
        if not ok:
            return False

        h = 1 << (log_folded + 1)
        w = bb.two_adic_generator_int(log_folded + 1)
        y0 = pow(w, _rev_bits(idx_level >> 1, log_folded), bb.P) \
            if log_folded > 0 else 1
        # xs for evals[0] is the even-position point: y0; odd is -y0
        xs0 = base(y0)
        xs1 = base(bb.P - y0)
        e0, e1 = tuple(evals[0]), tuple(evals[1])
        num = hmul(hsub(tuple(beta), xs0), hsub(e1, e0))
        folded = hadd(e0, hmul(num, hinv(hsub(xs1, xs0))))
        ro = reduced_openings.get(log_folded)
        if ro is not None:
            beta_sq = hmul(tuple(beta), tuple(beta))
            folded = hadd(folded, hmul(beta_sq, ro))
    return folded == tuple(final_poly_ct)


def _rev_bits(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r
