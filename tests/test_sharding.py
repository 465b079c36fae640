"""Mesh-sharded prover core on the 8-device CPU mesh."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from openvm_tpu.field import babybear as bb
from openvm_tpu import merkle, ntt
from openvm_tpu.parallel import make_mesh, sharded_commit, sharded_prove_core


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_commit_matches_single_device(rng):
    mesh = make_mesh(8)
    seg, rows, width = 2, 64, 8
    traces = rng.integers(0, bb.P, size=(seg, rows, width), dtype=np.uint64)
    tm = bb.to_monty(jnp.asarray(traces.astype(np.uint32)))
    roots = np.asarray(sharded_commit(mesh, tm))
    # reference: single-device commit per segment
    for s in range(seg):
        lde = ntt.coset_lde(tm[s], 1)
        want = merkle.commit_layers([lde])[-1][0]
        np.testing.assert_array_equal(roots[s], np.asarray(want))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_prove_core_runs(rng):
    mesh = make_mesh(8)
    traces = rng.integers(0, bb.P, size=(2, 32, 4), dtype=np.uint64)
    tm = bb.to_monty(jnp.asarray(traces.astype(np.uint32)))
    roots, total = sharded_prove_core(mesh, tm)
    assert roots.shape == (2, 8)
    # modular sum matches host computation
    want = int(traces.reshape(-1).astype(object).sum() % bb.P)
    got = int(np.asarray(bb.from_monty(total)))
    assert got == want


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8,)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_vm_proof_bytes_equal_single_device():
    """Full VM proof row-sharded over the mesh == single-device, byte for
    byte (the collectives change data placement, never values — exact
    modular arithmetic is reduction-order independent)."""
    from openvm_tpu.parallel import trace_sharding
    from openvm_tpu.stark.codec import encode_proof
    from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
    from tests.test_vm_prove import (FIB_EXECUTORS, TEST_STARK,
                                     build_fib_program)

    exe = build_fib_program(12)
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=FIB_EXECUTORS))
    vm.keygen()
    proof_single, _ = vm.prove(exe)
    mesh = make_mesh(8, seg_axis=1)
    with trace_sharding(mesh):
        proof_sharded, _ = vm.prove(exe)
    vm.verify(proof_sharded)
    assert encode_proof(proof_sharded) == encode_proof(proof_single)
