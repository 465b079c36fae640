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

import functools

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
# Batched device evaluation of interactions
#
# Wide-bus chips (bigint/modular/ecc heap adapters) carry ~100 bus messages
# per row.  Unrolling the per-message beta chains into the constraint DAG and
# jitting that graph made XLA compile time superlinear in message count (the
# round-1 "30-minute first prove" cliff).  Instead, interactions are stacked
# along a message axis and the denominators
#     d_i = alpha + bus_i + sum_j beta^{j+1} field_{i,j}
# are computed with a handful of vectorized ops whose HLO size is independent
# of the message count.  The same stacked form drives both the permutation
# trace build and the quotient-domain evaluation of the LogUp constraints.
# ---------------------------------------------------------------------------


def _modadd_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive modular prefix sum along axis 0 (x: (N, 4) ext monty)."""
    return jax.lax.associative_scan(bb.add, x, axis=0)


def stack_interactions(dag, env, n: int):
    """DAG-evaluate all interaction fields/counts over an n-row domain.

    Returns (fields (I, F, N) base monty zero-padded along F,
             signed_counts (I, N) base monty (receives negated),
             bus_m (I,) base monty).
    Traceable: safe to call inside jit with env holding traced arrays.
    """
    from .evaluator import DeviceOps

    its = dag.interactions
    roots = [r for (_, frs, cr, _) in its for r in frs + [cr]]
    vals = dag.eval(DeviceOps, env, roots=roots)

    def as_base_col(root):
        tag, v = vals[root]
        assert tag == "b", "interaction fields must be base-valued"
        return jnp.broadcast_to(v, (n,))

    f_max = max((len(frs) for (_, frs, _, _) in its), default=0)
    zero = bb.zeros((n,))
    fields = jnp.stack([
        jnp.stack([as_base_col(fr) for fr in frs]
                  + [zero] * (f_max - len(frs)))
        if frs else jnp.zeros((max(f_max, 1), n), jnp.uint32)
        for (_, frs, _, _) in its])  # (I, F, N)
    sc = jnp.stack([
        as_base_col(cr) if is_send else bb.neg(as_base_col(cr))
        for (_, _, cr, is_send) in its])  # (I, N)
    import numpy as _np
    bus_m = jnp.asarray(_np.asarray(
        [bb.to_monty_int(bus) for (bus, _, _, _) in its], dtype=_np.uint32))
    return fields, sc, bus_m


_STACK_JIT_CACHE: dict = {}


def _stack_interactions_cached(dag, env, n: int):
    """stack_interactions under jit, cached per (dag, shapes).

    The eager walk dispatches one device op per DAG node per prove — each
    distinct (op, shape) a fresh in-process XLA compile; profiling put
    most of the LogUp-phase wall time there.  One traced+compiled kernel
    per (dag, shapes) serves every prove of that VM config."""
    def shp(x):
        return None if x is None else (tuple(x.shape), str(x.dtype))

    key = (id(dag), n, tuple(shp(m) for m in env["main"]),
           shp(env.get("preprocessed")), shp(env.get("publics")))
    fn = _STACK_JIT_CACHE.get(key)
    if fn is None:
        def run(mains, prep, publics, challenges, dag=dag, n=n):
            e = {"main": list(mains), "preprocessed": prep, "perm": None,
                 "publics": publics, "challenges": challenges,
                 "exposed": ef.zeros((1,)), "sels": None, "next_step": 1}
            return stack_interactions(dag, e, n)
        fn = jax.jit(run)
        _STACK_JIT_CACHE[key] = fn
    return fn(tuple(env["main"]), env.get("preprocessed"),
              env["publics"], env["challenges"])


def _beta_pows(beta: jnp.ndarray, f_max: int) -> list:
    """[beta^1 .. beta^f_max] as (4,) ext monty values (log-depth shared)."""
    pows = {1: beta}

    def get(k):
        if k not in pows:
            h = k // 2
            pows[k] = ef.mul(get(h), get(k - h))
        return pows[k]

    return [get(j + 1) for j in range(f_max)]


def batched_denoms(fields: jnp.ndarray, bus_m: jnp.ndarray,
                   alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """d_i = alpha + bus_i + sum_j beta^{j+1} fields[i, j] -> (I, N, 4)."""
    i_n, f_max, n = fields.shape
    acc = ef.add(jnp.broadcast_to(alpha, (i_n, 4)), ef.from_base(bus_m))
    acc = jnp.broadcast_to(acc[:, None, :], (i_n, n, 4))
    for j, bp in enumerate(_beta_pows(beta, f_max)):
        acc = bb.add(acc, bb.mul(fields[:, j, :, None], bp[None, None, :]))
    return acc


_ROW_BLOCK = 1 << 16
_ROW_FLOOR = 1 << 12


@functools.partial(jax.jit, static_argnums=(3,))
def _perm_block(fields, sc, bus_m, num_chunks, chunk_gather, challenges):
    """Permutation columns for one row block: (N, 4*num_chunks) base monty.

    chunk_gather: (num_chunks, s_max) int32 interaction indices per chunk,
    padded with I (the index of an appended zero contribution).  Summation
    is modular bb.add over the tiny s_max axis — exact without u64 (JAX
    x64 mode is off, so wide-integer accumulation is unavailable).
    """
    d = batched_denoms(fields, bus_m, challenges[0], challenges[1])
    contrib = ef.scale(ef.inv(d), sc)  # (I, N, 4)
    n = fields.shape[2]
    contrib = jnp.concatenate(
        [contrib, jnp.zeros((1, n, 4), jnp.uint32)], axis=0)
    perm = jnp.zeros((num_chunks, n, 4), jnp.uint32)
    for k in range(chunk_gather.shape[1]):
        perm = bb.add(perm, contrib[chunk_gather[:, k]])
    return jnp.transpose(perm, (1, 0, 2)).reshape(n, 4 * num_chunks)


def build_perm_trace(dag, env, chunks: list[list[int]], challenges):
    """Compute the permutation trace on device (natural trace domain).

    dag: the AIR's SymbolicDag (interactions reference its nodes).
    env: DeviceOps environment over the natural-domain traces
         (main/preprocessed matrices, next_step=1; perm/challenges unused by
         interaction field expressions).
    challenges: (2, 4) ext monty device array [alpha, beta].
    Returns (perm_matrix (N, 4*(m+1)) base monty, cumsum (4,) ext monty).
    """
    n = (env["main"][0].shape[0] if env["main"]
         else env["preprocessed"].shape[0])
    # field/count expressions must see the full domain (offset=1 rolls wrap
    # around the whole trace), so stack first, then block rows
    fields, sc, bus_m = _stack_interactions_cached(dag, env, n)

    import numpy as _np

    def pow2(x):
        return 1 << max(x - 1, 0).bit_length()

    # Bucket the interaction/field/chunk axes to powers of two so one
    # compiled kernel serves every AIR in the bucket (per-AIR jits cost
    # ~30s each on XLA:CPU; a 19-AIR VM would pay 10 minutes of compiles).
    # Padded interactions carry count 0 -> zero contribution; padded chunk
    # slots gather the appended zero row.
    n_its = len(dag.interactions)
    m = len(chunks)
    i_pad = pow2(n_its)
    f_pad = pow2(fields.shape[1])
    c_pad = pow2(m)
    s_max = pow2(max(len(c) for c in chunks))
    fields = jnp.pad(fields, ((0, i_pad - n_its), (0, f_pad - fields.shape[1]),
                              (0, 0)))
    sc = jnp.pad(sc, ((0, i_pad - n_its), (0, 0)))
    bus_m = jnp.pad(bus_m, (0, i_pad - n_its))
    chunk_gather = _np.full((c_pad, s_max), i_pad, dtype=_np.int32)
    for j, chunk in enumerate(chunks):
        chunk_gather[j, :len(chunk)] = chunk
    chunk_gather = jnp.asarray(chunk_gather)

    # rows: pad small traces to a floor height so they share one kernel
    # (wasted rows are trivial; a fresh XLA compile is not)
    n_pad = max(n, _ROW_FLOOR)
    if n_pad > n:
        fields = jnp.pad(fields, ((0, 0), (0, 0), (0, n_pad - n)))
        sc = jnp.pad(sc, ((0, 0), (0, n_pad - n)))

    blocks = []
    for r0 in range(0, n_pad, _ROW_BLOCK):
        blocks.append(_perm_block(fields[:, :, r0:r0 + _ROW_BLOCK],
                                  sc[:, r0:r0 + _ROW_BLOCK], bus_m, c_pad,
                                  chunk_gather, challenges)[:, :4 * m])
    perm_cols = (jnp.concatenate(blocks, axis=0) if len(blocks) > 1
                 else blocks[0])[:n]  # (N, 4m)
    # one fused jit for the tail (row-sum + prefix scan + concat + last
    # element): the unrolled eager version cost m+3 small compiles per
    # (n, m) shape class — ~2s each on this backend, every process
    return _perm_tail_jit(perm_cols)


@jax.jit
def _perm_tail_jit(perm_cols: jnp.ndarray):
    """(N, 4m) perm columns -> ((N, 4m+4) matrix with phi appended,
    (4,) cumulative sum)."""
    n = perm_cols.shape[0]
    m = perm_cols.shape[1] // 4
    row_sum = ef.sum_mod(perm_cols.reshape(n, m, 4), axis=1)  # (N, 4)
    phi = _modadd_scan(row_sum)
    perm_matrix = jnp.concatenate([perm_cols, phi.reshape(n, 4)], axis=1)
    return perm_matrix, phi[-1]


def _pow_ladder(alpha, k: int) -> jnp.ndarray:
    """(k, 4) ext monty [alpha^0 .. alpha^{k-1}] via log-depth doubling."""
    pows = ef.ones((1,))
    a_n = alpha
    while pows.shape[0] < k:
        pows = jnp.concatenate(
            [pows, ef.mul(pows, jnp.broadcast_to(a_n, pows.shape))])
        a_n = ef.mul(a_n, a_n)
    return pows[:k]


def eval_logup_folded(dag, chunks: list[list[int]], env, alpha_fold):
    """Horner-fold the LogUp constraint values over the evaluation domain.

    Evaluates the same constraints appended by ``append_logup_constraints``
    — chunk identities, then the phi first/transition/last constraints — in
    the same order, but batched along the message AND chunk axes instead of
    unrolled in the DAG (identical field values; exact arithmetic).  A chip
    with C chunks costs O(s_max) big tensor ops, not O(C·s_max) small ones
    — XLA:CPU compile time is superlinear in HLO op count, and the
    per-chunk unrolled form made wide chips (75+ chunks) take minutes of
    compile per AIR.  Returns the (N, 4) ext monty Horner accumulation
    sum_k alpha_fold^{K-1-k} c_k, for the prover's quotient path.
    Traceable under jit.
    """
    n = (env["main"][0].shape[0] if env["main"]
         else env["preprocessed"].shape[0])
    step = env["next_step"]
    alpha_ch = env["challenges"][0]
    beta_ch = env["challenges"][1]
    fields, sc, bus_m = stack_interactions(dag, env, n)
    d = batched_denoms(fields, bus_m, alpha_ch, beta_ch)  # (I, N, 4)

    perm = env["perm"]
    m = len(chunks)
    n_its = len(dag.interactions)
    s_max = max(len(c) for c in chunks)

    import numpy as _np
    chunk_gather = _np.full((m, s_max), n_its, dtype=_np.int32)
    for j, chunk in enumerate(chunks):
        chunk_gather[j, :len(chunk)] = chunk
    chunk_gather = jnp.asarray(chunk_gather)

    # padded slots: multiplicative identity denom, zero count
    d_pad = jnp.concatenate([d, ef.ones((n,))[None]], axis=0)
    sc_pad = jnp.concatenate([sc, jnp.zeros((1, n), jnp.uint32)], axis=0)
    ds = d_pad[chunk_gather]      # (C, S, N, 4)
    scs = sc_pad[chunk_gather]    # (C, S, N)

    # prefix/suffix products along the tiny S axis, batched over chunks
    ones_c = jnp.broadcast_to(ef.ones((1,))[0], (m, n, 4))
    prefix = [ones_c]
    for k in range(s_max):
        prefix.append(ef.mul(prefix[-1], ds[:, k]))
    suffix = [ones_c]
    for k in reversed(range(s_max)):
        suffix.insert(0, ef.mul(ds[:, k], suffix[0]))

    perm_c = jnp.transpose(
        perm[:, :4 * m].reshape(n, m, 4), (1, 0, 2))  # (C, N, 4)
    lhs = ef.mul(perm_c, prefix[s_max])
    rhs = jnp.zeros((m, n, 4), jnp.uint32)
    for k in range(s_max):
        excl = ef.mul(prefix[k], suffix[k + 1])
        rhs = ef.add(rhs, ef.scale(excl, scs[:, k]))
    cons_chunks = ef.sub(lhs, rhs)  # (C, N, 4)

    def perm_col(j, offset=0):
        cols = perm[:, 4 * j:4 * j + 4]
        return jnp.roll(cols, -step, axis=0) if offset else cols

    phi = perm_col(m)
    phi_next = perm_col(m, offset=1)
    perm_sum = ef.sum_mod(perm_c, axis=0)
    perm_next = jnp.roll(perm[:, :4 * m], -step, axis=0)
    perm_sum_next = ef.sum_mod(
        jnp.transpose(perm_next.reshape(n, m, 4), (1, 0, 2)), axis=0)

    def sel(name):
        return env["sels"][name]

    exposed = jnp.broadcast_to(env["exposed"][0], (n, 4))
    c_first = ef.scale(ef.sub(phi, perm_sum), sel("is_first_row"))
    c_trans = ef.scale(
        ef.sub(ef.sub(phi_next, phi), perm_sum_next), sel("is_transition"))
    c_last = ef.scale(ef.sub(phi, exposed), sel("is_last_row"))

    # Horner order: [chunk_0..chunk_{C-1}, first, trans, last] — same value
    # as the sequential fold, computed as sum_j alpha^{K-1-j} c_j with the
    # chunk part batched over C.
    pows = _pow_ladder(alpha_fold, m + 3)          # alpha^0 .. alpha^{C+2}
    chunk_pows = pows[3:m + 3][::-1]               # alpha^{C+2} .. alpha^3
    weighted = ef.mul(cons_chunks, chunk_pows[:, None, :])
    acc = ef.sum_mod(weighted, axis=0)             # (N, 4)
    acc = ef.add(acc, ef.mul(c_first,
                             jnp.broadcast_to(pows[2], (n, 4))))
    acc = ef.add(acc, ef.mul(c_trans,
                             jnp.broadcast_to(pows[1], (n, 4))))
    acc = ef.add(acc, c_last)
    return acc


def num_logup_constraints(vk) -> int:
    """Number of constraint roots appended by append_logup_constraints."""
    return (len(vk.interaction_chunks) + 3) if vk.dag.interactions else 0
