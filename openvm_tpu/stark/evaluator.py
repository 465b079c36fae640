"""DAG evaluation backends.

DeviceOps evaluates a SymbolicDag vectorized over trace rows on device
(uint32 monty; base values shape (N,) / scalars (), extension values
(N, 4) / (4,)).  HostOps evaluates pointwise with python ints (the verifier's
folded-constraint check at zeta, where every trace cell is extension-valued).

Values are tagged ('b', x) for base field or ('e', x) for the quartic
extension; mixed arithmetic promotes as needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..field import ext as ef

P = bb.P
EXT_W = 11


# ---------------------------------------------------------------------------
# Device backend
# ---------------------------------------------------------------------------


class DeviceOps:
    """env keys:
      main: list of (N, W) base monty matrices (one per partition)
      preprocessed: (N, W) or None
      perm: (N, 4*m) base monty (flattened ext columns) or None
      publics: (num_pvs,) base monty (canonical values pre-montied)
      challenges: (k, 4) ext monty
      exposed: (k, 4) ext monty
      sels: {'is_first_row'|'is_last_row'|'is_transition': (N,) base monty}
      next_step: int row shift for offset=1
    """

    @staticmethod
    def const(v: int):
        return ("b", jnp.asarray(np.uint32(bb.to_monty_int(v % P))))

    @staticmethod
    def var(env, entry, part, offset, index):
        step = env["next_step"] * offset
        if entry == "main":
            m = env["main"][part]
            col = m[:, index]
            return ("b", jnp.roll(col, -step, axis=0) if step else col)
        if entry == "preprocessed":
            m = env["preprocessed"]
            col = m[:, index]
            return ("b", jnp.roll(col, -step, axis=0) if step else col)
        if entry == "permutation":
            m = env["perm"]
            cols = m[:, 4 * index:4 * index + 4]
            return ("e", jnp.roll(cols, -step, axis=0) if step else cols)
        if entry == "public":
            return ("b", env["publics"][index])
        if entry == "challenge":
            return ("e", env["challenges"][index])
        if entry == "exposed":
            return ("e", env["exposed"][index])
        raise KeyError(entry)

    @staticmethod
    def sel(env, which):
        return ("b", env["sels"][which])

    @staticmethod
    def _promote(x):
        tag, v = x
        if tag == "e":
            return v
        v = jnp.asarray(v)
        z = jnp.zeros(v.shape + (3,), dtype=jnp.uint32)
        return jnp.concatenate([v[..., None], z], axis=-1)

    @classmethod
    def add(cls, a, b):
        if a[0] == b[0]:
            return (a[0], bb.add(a[1], b[1]))
        return ("e", bb.add(cls._promote(a), cls._promote(b)))

    @classmethod
    def sub(cls, a, b):
        if a[0] == b[0]:
            return (a[0], bb.sub(a[1], b[1]))
        return ("e", bb.sub(cls._promote(a), cls._promote(b)))

    @classmethod
    def mul(cls, a, b):
        if a[0] == "b" and b[0] == "b":
            return ("b", bb.mul(a[1], b[1]))
        if a[0] == "e" and b[0] == "e":
            return ("e", ef.mul(a[1], b[1]))
        e, s = (a, b) if a[0] == "e" else (b, a)
        return ("e", bb.mul(e[1], jnp.asarray(s[1])[..., None]))

    @classmethod
    def neg(cls, a):
        return (a[0], bb.neg(a[1]))


# ---------------------------------------------------------------------------
# Host backend (python ints; ext = tuple of 4 ints)
# ---------------------------------------------------------------------------


def hadd(a, b):
    return tuple((x + y) % P for x, y in zip(a, b))


def hsub(a, b):
    return tuple((x - y) % P for x, y in zip(a, b))


def hneg(a):
    return tuple((-x) % P for x in a)


def hmul(a, b):
    c = [0] * 7
    for i in range(4):
        if a[i] == 0:
            continue
        for j in range(4):
            c[i + j] = (c[i + j] + a[i] * b[j]) % P
    return tuple((c[k] + EXT_W * c[k + 4]) % P if k < 3 else c[k]
                 for k in range(4))


def hinv(a):
    """Extension inverse via frobenius/norm (host ints)."""
    def frob(x, k):
        s = pow(EXT_W, (P - 1) // 4 * k, P)
        return tuple((x[i] * pow(s, i, P)) % P for i in range(4))

    f1, f2, f3 = frob(a, 1), frob(a, 2), frob(a, 3)
    g = hmul(f1, hmul(f2, f3))
    norm = int(hmul(a, g)[0])
    ninv = pow(norm, -1, P)
    return tuple((x * ninv) % P for x in g)


def base(v: int):
    return (v % P, 0, 0, 0)


class HostOps:
    """env keys (everything already at the out-of-domain point zeta):
      main: list of (local_row, next_row) pairs of lists of ext tuples
      preprocessed: (local, next) or None
      perm: (local, next) lists of ext tuples (unflattened) or None
      publics: list of ints
      challenges: list of ext tuples
      exposed: list of ext tuples
      sels: {'is_first_row', 'is_last_row', 'is_transition'}: ext tuples
    """

    @staticmethod
    def const(v: int):
        return base(v)

    @staticmethod
    def var(env, entry, part, offset, index):
        if entry == "main":
            return env["main"][part][offset][index]
        if entry == "preprocessed":
            return env["preprocessed"][offset][index]
        if entry == "permutation":
            return env["perm"][offset][index]
        if entry == "public":
            return base(env["publics"][index])
        if entry == "challenge":
            return env["challenges"][index]
        if entry == "exposed":
            return env["exposed"][index]
        raise KeyError(entry)

    @staticmethod
    def sel(env, which):
        return env["sels"][which]

    add = staticmethod(hadd)
    sub = staticmethod(hsub)
    mul = staticmethod(hmul)
    neg = staticmethod(hneg)


# ---------------------------------------------------------------------------
# Cached-jit DAG column evaluation
# ---------------------------------------------------------------------------
#
# Eagerly walking a DAG with DeviceOps dispatches one device op per node;
# each distinct (op, shape) is a fresh in-process XLA compile, and a
# 15-AIR prove walks thousands of nodes — profiling attributed most of the
# LogUp/lookup wall time to exactly this.  jit_dag_columns traces the walk
# ONCE per (dag, roots, shapes) and compiles it to a single fused kernel
# returning the requested roots broadcast to full columns.

import jax as _jax

_DAG_COLS_CACHE: dict = {}


def jit_dag_columns(dag, env, roots, n: int):
    """dag.eval(DeviceOps) of `roots` over an n-row env, one jitted call.

    Returns {root: (N,) base monty column}.  All roots must be
    base-valued.  env: DeviceOps environment (sels/arrays may be None);
    next_step is captured statically.
    """
    uniq = tuple(dict.fromkeys(roots))

    def shp(x):
        return None if x is None else (tuple(x.shape), str(x.dtype))

    sels = env.get("sels") or None
    key = (id(dag), uniq, n,
           tuple(shp(m) for m in env["main"]),
           shp(env.get("preprocessed")), shp(env.get("perm")),
           shp(env.get("publics")), shp(env.get("challenges")),
           shp(env.get("exposed")),
           tuple(sorted((k, shp(v)) for k, v in (sels or {}).items())),
           env.get("next_step"))
    fn = _DAG_COLS_CACHE.get(key)
    if fn is None:
        step = env.get("next_step", 1)

        def run(arrs, dag=dag, uniq=uniq, step=step, n=n):
            e = dict(arrs)
            e["next_step"] = step
            vals = dag.eval(DeviceOps, e, roots=list(uniq))
            return [jnp.broadcast_to(vals[r][1], (n,)) for r in uniq]

        fn = _jax.jit(run)
        _DAG_COLS_CACHE[key] = fn
    arrs = {"main": list(env["main"]),
            "preprocessed": env.get("preprocessed"),
            "perm": env.get("perm"), "publics": env.get("publics"),
            "challenges": env.get("challenges"),
            "exposed": env.get("exposed"), "sels": sels}
    out = fn(arrs)
    return dict(zip(uniq, out))


_DAG_HIST_CACHE: dict = {}


def jit_dag_lookup_hist(dag, env, sends, n: int, range_h: int,
                        tuple_sizes: tuple):
    """Device-side lookup-multiplicity histograms for one AIR, one jit.

    sends: [(bus_kind, field_roots, count_root)] with bus_kind in
    {"range", "bitwise", "tuple"}.  Returns (range_hist (range_h,),
    bitwise_hist (2*65536,), tuple_hist (max(tuple_total,1),)) as uint32
    device arrays.  Replaces the stacked device->host column transfer
    (hundreds of MB/AIR at 2^19 rows) + host np.add.at scatter with
    on-device scatter-adds and a table-sized transfer.  Exact: every bin
    sum is bounded by total sends << 2^32.
    """
    from ..field import babybear as bb

    uniq = tuple(dict.fromkeys(
        r for (_, frs, cr) in sends for r in list(frs) + [cr]))
    sends_sig = tuple((k, tuple(frs), cr) for (k, frs, cr) in sends)

    def shp(x):
        return None if x is None else (tuple(x.shape), str(x.dtype))

    tuple_total = tuple_sizes[0] * tuple_sizes[1] if tuple_sizes else 0
    sizes1 = tuple_sizes[1] if tuple_sizes else 1
    key = (id(dag), sends_sig, n, range_h, tuple_total,
           tuple(shp(m) for m in env["main"]),
           shp(env.get("preprocessed")))
    fn = _DAG_HIST_CACHE.get(key)
    if fn is None:
        step = env.get("next_step", 1)

        def run(arrs, dag=dag, uniq=uniq, step=step, n=n):
            e = dict(arrs)
            e["next_step"] = step
            vals = dag.eval(DeviceOps, e, roots=list(uniq))

            def colv(r):  # canonical uint32 column
                return bb.from_monty(jnp.broadcast_to(vals[r][1], (n,)))

            rh = jnp.zeros(range_h, jnp.uint32)
            bh = jnp.zeros(2 * 65536, jnp.uint32)
            th = jnp.zeros(max(tuple_total, 1), jnp.uint32)
            for (kind, frs, cr) in sends_sig:
                counts = colv(cr)
                live = counts != 0
                if kind == "range":
                    value, bits = colv(frs[0]), colv(frs[1])
                    idx = jnp.where(
                        bits == 0, 0,
                        (jnp.left_shift(jnp.uint32(1),
                                        jnp.minimum(bits, 30)) - 1 + value))
                    idx = jnp.where(live, idx, 0)
                    rh = rh.at[idx].add(counts, mode="drop")
                elif kind == "tuple":
                    x, y = colv(frs[0]), colv(frs[1])
                    idx = jnp.where(live, x * sizes1 + y, 0)
                    th = th.at[idx].add(counts, mode="drop")
                else:  # bitwise
                    x, y = colv(frs[0]), colv(frs[1])
                    is_xor = colv(frs[3])
                    idx = jnp.where(live, (x * 256 + y) * 2 + is_xor, 0)
                    bh = bh.at[idx].add(counts, mode="drop")
            return rh, bh, th

        fn = _jax.jit(run)
        _DAG_HIST_CACHE[key] = fn
    arrs = {"main": list(env["main"]),
            "preprocessed": env.get("preprocessed"),
            "perm": None, "publics": env.get("publics"),
            "challenges": env.get("challenges"),
            "exposed": env.get("exposed"), "sels": env.get("sels")}
    return fn(arrs)

