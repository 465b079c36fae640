"""LogUp permutation argument: constraint synthesis + device trace build.

Replaces the reference stark-backend's LogUp interaction machinery (SURVEY.md
section 2.2: "LogUp phase: check PoW witness, sample 2 challenges, per-air
cumulative sums exposed + summed to zero").  Scheme:

  challenges (one phase): alpha = ch[0], beta = ch[1] (quartic extension).
  interaction i: denom_i = alpha + bus_i + sum_j beta^(j+1) * field_{i,j}
                 signed count: +count (send) / -count (receive)
  interactions are chunked so each chunk constraint stays within the
  configured max constraint degree; permutation trace columns (extension
  valued, flattened to 4 base columns each for commitment):
      perm[j] = sum_{i in chunk_j} sign_i * count_i / denom_i
      phi     = running prefix sum of sum_j perm[j]   (last entry exposed)
  constraints appended to the AIR's DAG:
      chunk j:    perm[j] * prod denom - sum_i sign_i count_i prod_{k!=i}
                  denom_k == 0
      first row:  phi == sum_j perm[j]
      transition: phi_next - phi == sum_j perm_next[j]
      last row:   phi == exposed[0]
  global check (verifier): sum over AIRs of exposed cumulative sums == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field import ext as ef
from .symbolic import AirBuilder, Interaction, Var, degree


def chunk_interactions(interactions: list[Interaction],
                       max_constraint_degree: int) -> list[list[int]]:
    """Greedily chunk interaction indices keeping constraint degree bounded."""
    chunks: list[list[int]] = []
    cur: list[int] = []
    cur_denom_deg = 0

    def d_deg(it: Interaction) -> int:
        return max([degree(f) for f in it.fields], default=0)

    for i, it in enumerate(interactions):
        dd = max(d_deg(it), 1)
        cd = degree(it.count)
        # chunk constraint degree ~ 1 + sum(denom degs) (LHS) — keep <= max
        new_deg = 1 + cur_denom_deg + dd
        rhs_deg = cd + cur_denom_deg  # conservative
        if cur and max(new_deg, rhs_deg) > max_constraint_degree:
            chunks.append(cur)
            cur = []
            cur_denom_deg = 0
        cur.append(i)
        cur_denom_deg += dd
    if cur:
        chunks.append(cur)
    return chunks


def append_logup_constraints(builder: AirBuilder,
                             max_constraint_degree: int) -> int:
    """Append LogUp constraints for builder.interactions; returns num chunks.

    Permutation columns are referenced as Var('permutation', 0, offset, j),
    challenges as Var('challenge', 0, 0, {0,1}), exposed cumulative sum as
    Var('exposed', 0, 0, 0).  Challenge/permutation values are
    extension-valued at evaluation time.
    """
    its = builder.interactions
    if not its:
        return 0
    chunks = chunk_interactions(its, max_constraint_degree)
    alpha = Var("challenge", 0, 0, 0)
    beta = Var("challenge", 0, 0, 1)

    # beta powers via log-depth products (linear chains of 30+ muls trip a
    # superlinear XLA:CPU compile path); hash-consing shares the table
    # across all denominators.
    bpows = {0: None, 1: beta}

    def bpow(k: int):
        if k not in bpows:
            h = k // 2
            bpows[k] = bpow(h) * bpow(k - h)
        return bpows[k]

    def denom(it: Interaction):
        acc = alpha + it.bus
        for j, f in enumerate(it.fields):
            acc = acc + bpow(j + 1) * f
        return acc

    def signed_count(it: Interaction):
        return it.count if it.is_send else -it.count

    num_chunks = len(chunks)
    # chunk constraints (all rows)
    for j, chunk in enumerate(chunks):
        denoms = [denom(its[i]) for i in chunk]
        perm_j = Var("permutation", 0, 0, j)
        lhs = perm_j
        for d in denoms:
            lhs = lhs * d
        rhs = None
        for a, i in enumerate(chunk):
            term = signed_count(its[i])
            for b2, _ in enumerate(chunk):
                if b2 != a:
                    term = term * denoms[b2]
            rhs = term if rhs is None else rhs + term
        builder.constraints.append(lhs - rhs)

    phi = Var("permutation", 0, 0, num_chunks)
    phi_next = Var("permutation", 0, 1, num_chunks)
    perm_sum_local = None
    perm_sum_next = None
    for j in range(num_chunks):
        pl = Var("permutation", 0, 0, j)
        pn = Var("permutation", 0, 1, j)
        perm_sum_local = pl if perm_sum_local is None else perm_sum_local + pl
        perm_sum_next = pn if perm_sum_next is None else perm_sum_next + pn

    first = builder.is_first_row()
    trans = builder.is_transition()
    last = builder.is_last_row()
    builder.constraints.append(first * (phi - perm_sum_local))
    builder.constraints.append(trans * (phi_next - phi - perm_sum_next))
    builder.constraints.append(last * (phi - Var("exposed", 0, 0, 0)))
    return num_chunks


# ---------------------------------------------------------------------------
# Device permutation-trace generation
# ---------------------------------------------------------------------------


def _modadd_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive modular prefix sum along axis 0 (x: (N, 4) ext monty)."""
    return jax.lax.associative_scan(bb.add, x, axis=0)


def build_perm_trace(dag, env, chunks: list[list[int]], challenges):
    """Compute the permutation trace on device (natural trace domain).

    dag: the AIR's SymbolicDag (interactions reference its nodes).
    env: DeviceOps environment over the natural-domain traces
         (main/preprocessed matrices, next_step=1; perm/challenges unused by
         interaction field expressions).
    challenges: (2, 4) ext monty device array [alpha, beta].
    Returns (perm_matrix (N, 4*(m+1)) base monty, cumsum (4,) ext monty).
    """
    from .evaluator import DeviceOps

    roots = [r for (_, frs, cr, _) in dag.interactions for r in frs + [cr]]
    vals = dag.eval(DeviceOps, env, roots=roots)
    n = env["main"][0].shape[0] if env["main"] else env["preprocessed"].shape[0]
    alpha = challenges[0]
    beta = challenges[1]

    def as_base_col(root):
        tag, v = vals[root]
        assert tag == "b", "interaction fields must be base-valued"
        return jnp.broadcast_to(v, (n,))

    # denominators per interaction: (N, 4) ext
    denoms = []
    signed_counts = []
    for bus, field_roots, count_root, is_send in dag.interactions:
        acc = ef.add(ef.from_base(bb.full((), bus)), alpha)
        acc = jnp.broadcast_to(acc, (n, 4))
        bpow = beta
        for fr in field_roots:
            f = as_base_col(fr)
            acc = ef.add(acc, ef.scale(jnp.broadcast_to(bpow, (n, 4)), f))
            bpow = ef.mul(bpow, beta)
        denoms.append(acc)
        cnt = as_base_col(count_root)
        signed_counts.append(cnt if is_send else bb.neg(cnt))

    # batch-invert all denominators at once
    all_d = jnp.stack(denoms)  # (I, N, 4)
    all_inv = ef.inv(all_d)

    m = len(chunks)
    perm_cols = []
    for chunk in chunks:
        acc = ef.zeros((n,))
        for i in chunk:
            acc = ef.add(acc, ef.scale(all_inv[i], signed_counts[i]))
        perm_cols.append(acc)

    row_sum = ef.zeros((n,))
    for c in perm_cols:
        row_sum = ef.add(row_sum, c)
    phi = _modadd_scan(row_sum)  # (N, 4) inclusive prefix sums
    cumsum = phi[-1]

    perm_matrix = jnp.concatenate(
        [c.reshape(n, 4) for c in perm_cols] + [phi.reshape(n, 4)], axis=1)
    return perm_matrix, cumsum
