"""Mesh sharding of the prover's device core.

Parallelism axes (SURVEY.md section 2.20 mapping):
  * "seg"  — continuation segments are independent proofs: pure data
    parallelism (the reference proves them sequentially;
    docs/crates/vm.md:258-270 earmarks exactly this distribution seam).
  * "row"  — trace rows: NTT stages and Merkle layers shard across rows;
    XLA inserts the all-to-alls/gathers implied by the butterfly reshapes.

The prover's per-segment device core (LDE -> commit -> quotient) is a pure
function of the trace, so `jax.vmap` over a leading segment axis + sharding
annotations give both axes with no code duplication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import merkle, ntt
from ..field import babybear as bb


def make_mesh(n_devices: int | None = None, seg_axis: int | None = None
              ) -> Mesh:
    """2D mesh (seg, row) over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if seg_axis is None:
        # favor row parallelism; keep seg axis small
        seg_axis = 2 if n % 2 == 0 and n > 2 else 1
    row_axis = n // seg_axis
    import numpy as np
    return Mesh(np.array(devs).reshape(seg_axis, row_axis), ("seg", "row"))


import contextlib


@contextlib.contextmanager
def trace_sharding(mesh: Mesh):
    """Row-shard every trace matrix entering `stark.prove` over `mesh`.

    Usage::

        with trace_sharding(mesh):
            proof = vm.prove(exe)          # full VM proof, row-sharded

    Every 2D trace whose height divides the mesh's "row" axis is placed
    with PartitionSpec("row", None); the prover's downstream device
    compute (NTT butterflies, Merkle layers, LogUp scans, quotient
    evaluation, FRI folds) then runs distributed — XLA inserts the
    collectives (all-to-alls at bit-reversals/reshapes, all-gathers at
    tree tops, psums at reductions) implied by the data movement.  Proof
    bytes equal the single-device run (exact modular arithmetic is
    reduction-order independent); `tests/test_sharding.py` asserts this.
    """
    from ..stark import prover as pv

    prev = pv._TRACE_SHARDING
    pv._TRACE_SHARDING = NamedSharding(mesh, P("row", None))
    try:
        yield
    finally:
        pv._TRACE_SHARDING = prev


def _commit_core(trace: jnp.ndarray, log_blowup: int = 1):
    """LDE + Merkle root for one trace matrix (device core, jittable)."""
    lde = ntt.coset_lde(trace, log_blowup)
    layers = merkle.commit_layers([lde])
    return layers[-1][0]


def sharded_commit(mesh: Mesh, traces: jnp.ndarray, log_blowup: int = 1):
    """Commit a batch of segment traces: traces (S, N, W) monty uint32.

    S shards over "seg", rows N shard over "row".
    """
    in_sharding = NamedSharding(mesh, P("seg", "row", None))

    @jax.jit
    def step(batch):
        return jax.vmap(lambda t: _commit_core(t, log_blowup))(batch)

    traces = jax.device_put(traces, in_sharding)
    return step(traces)


def sharded_prove_core(mesh: Mesh, traces: jnp.ndarray, log_blowup: int = 1):
    """One sharded 'prover step': commit all segment traces + a LogUp-style
    modular reduction across the mesh (exercises psum-like collectives).

    Returns (roots (S, 8), global_sum ()) — jitted once over the mesh.
    """
    in_sharding = NamedSharding(mesh, P("seg", "row", None))

    @jax.jit
    def step(batch):
        roots = jax.vmap(lambda t: _commit_core(t, log_blowup))(batch)
        total = bb.sum_mod(bb.sum_mod(batch.reshape(batch.shape[0], -1),
                                      axis=1), axis=0)
        return roots, total

    traces = jax.device_put(traces, in_sharding)
    return step(traces)
