"""Logical constraint debugger (pre-cryptographic checks).

Re-design of the reference's `stark-debug` feature (reference
crates/vm/src/arch/vm.rs:1276-1326 and SURVEY.md section 4: "the logical
constraint debugger (cheap, pre-crypto)" is a load-bearing test layer):

  * evaluates every AIR's base constraints row-by-row on the natural trace
    domain (selectors as 0/1 indicators) and reports the first failing
    (air, constraint, row);
  * checks global bus balance: the signed multiset of all interaction
    messages across AIRs must cancel per bus.

Runs on device via the same DAG evaluator the prover uses.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..field import babybear as bb
from .evaluator import DeviceOps

P = 2013265921


def _natural_sels(n):
    import jax.numpy as jnp
    first = np.zeros(n, dtype=np.uint64)
    first[0] = 1
    last = np.zeros(n, dtype=np.uint64)
    last[-1] = 1
    trans = np.ones(n, dtype=np.uint64)
    trans[-1] = 0
    conv = lambda a: bb.to_monty(jnp.asarray(a.astype(np.uint32)))
    return {"is_first_row": conv(first), "is_last_row": conv(last),
            "is_transition": conv(trans)}


def _refs_phase1(dag, root) -> bool:
    """Does the subgraph reference permutation/challenge/exposed vars?"""
    stack = [root]
    seen = set()
    while stack:
        i = stack.pop()
        if i in seen:
            continue
        seen.add(i)
        n = dag.nodes[i]
        if n[0] == "var" and n[1] in ("permutation", "challenge", "exposed"):
            return True
        if n[0] in ("add", "sub", "mul"):
            stack += [n[1], n[2]]
        elif n[0] == "neg":
            stack.append(n[1])
    return False


def check_constraints(pk, ctxs, raise_on_error=True):
    """Debug-check base constraints + bus balance for the given contexts.

    ctxs: list of AirProvingContext (canonical numpy or monty device
    matrices).  Returns a list of failure strings (empty = all good).
    """
    import jax.numpy as jnp

    from .prover import _to_device_monty

    failures = []
    bus_totals = defaultdict(lambda: defaultdict(int))

    for ctx in ctxs:
        apk = pk.per_air[ctx.air_id]
        vk = apk.vk
        dag = vk.dag
        common = _to_device_monty(ctx.common_main) \
            if ctx.common_main is not None else None
        cacheds = [_to_device_monty(m) for m in ctx.cached_mains]
        n = int((common if common is not None else cacheds[0]).shape[0])
        env = {
            "main": cacheds + ([common] if common is not None else []),
            "preprocessed": apk.preprocessed_trace,
            "perm": None,
            "publics": bb.to_monty(jnp.asarray(np.asarray(
                ctx.public_values or [0], dtype=np.uint64)
                .astype(np.uint32))),
            "challenges": jnp.zeros((2, 4), jnp.uint32),
            "exposed": jnp.zeros((1, 4), jnp.uint32),
            "sels": _natural_sels(n),
            "next_step": 1,
        }
        base_roots = [r for r in dag.constraint_roots
                      if not _refs_phase1(dag, r)]
        int_roots = [r for (_, frs, cr, _) in dag.interactions
                     for r in frs + [cr]]
        vals = dag.eval(DeviceOps, env, roots=base_roots + int_roots)

        for k, root in enumerate(dag.constraint_roots):
            if root not in [r for r in base_roots]:
                continue
            tag, v = vals[root]
            arr = np.asarray(bb.from_monty(v))
            bad = np.nonzero(np.broadcast_to(arr, (n,) if tag == "b"
                                             else (n, 4)))[0]
            if len(bad):
                failures.append(
                    f"air {vk.name}: constraint #{k} nonzero at row "
                    f"{bad[0]} (of {n})")

        # bus accounting
        for (bus, frs, cr, is_send) in dag.interactions:
            fields = []
            for r in frs:
                tag, v = vals[r]
                fields.append(np.broadcast_to(
                    np.asarray(bb.from_monty(v), dtype=np.uint64), (n,)))
            tag, v = vals[cr]
            counts = np.broadcast_to(
                np.asarray(bb.from_monty(v), dtype=np.uint64), (n,))
            sign = 1 if is_send else -1
            nz = np.nonzero(counts)[0]
            for row in nz:
                key = tuple(int(f[row]) for f in fields)
                bus_totals[bus][key] += sign * int(counts[row])

    for bus, table in bus_totals.items():
        for key, total in table.items():
            if total % P != 0:
                failures.append(
                    f"bus {bus}: message {key} unbalanced (net {total})")
                if len(failures) > 20:
                    break

    if failures and raise_on_error:
        raise AssertionError("constraint debug failures:\n  "
                             + "\n  ".join(failures[:30]))
    return failures
