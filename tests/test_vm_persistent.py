"""Persistent-memory VM: fibonacci proven with Merkle-committed memory.

The continuation-mode system set: persistent boundary + memory Merkle chip +
Poseidon2 chip replace the volatile boundary/public-values pair; the proof
exposes (initial_root, final_root) and user public values come from a
Merkle proof against the final root (reference UserPublicValuesProof).
"""

import os

import numpy as np
import pytest

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from openvm_tpu.vm.memory_tree import pv_proof, verify_pv_proof
from tests.test_vm_prove import FIB_EXECUTORS, build_fib_program, fib

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))


def test_persistent_fib_debug_and_roots():
    exe = build_fib_program(8)
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, persistent=True,
                                   executors=FIB_EXECUTORS))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    captured = {}

    def fake_prove(pk, ctxs):
        captured["ctxs"] = ctxs
        raise SystemExit(0)

    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = fake_prove
    try:
        proof, pre = vm.prove(exe, debug=True)
    except SystemExit:
        proof = None
        pre = None
    finally:
        M.stark_prove = orig

    if proof is not None:  # OPENVM_SLOW: full crypto prove + verify
        result = vm.verify(proof,
                           expected_exe_commit=vm.commit_exe(exe))
        # the initial root must equal the committed initial memory
        assert list(result["initial_root"]) == \
            [int(x) for x in vm.commit_init_memory(exe)]
        # user public values via Merkle proof against the final root
        proof_pv = pv_proof(pre.final_memory_tree, num_pv_words=8)
        assert np.array_equal(
            np.asarray(proof_pv["root"]),
            np.asarray(result["final_root"], dtype=np.uint64))
        assert verify_pv_proof(proof_pv, num_pv_words=8)
        got = int.from_bytes(bytes(proof_pv["public_values"][:4]), "little")
        assert got == fib(9)
    else:
        # debug path ran check_constraints inside prove (raises on failure)
        ctxs = captured["ctxs"]
        mk = next(c for c in ctxs
                  if vm.airs[c.air_id].name == "memory_merkle")
        assert len(mk.public_values) == 16
        # initial root binds to the committed initial memory
        assert mk.public_values[:8] == \
            [int(x) for x in vm.commit_init_memory(exe)]


def test_continuations_three_segments():
    exe = build_fib_program(20)
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, persistent=True,
                                   executors=FIB_EXECUTORS))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    segments = []

    if not os.environ.get("OPENVM_SLOW"):
        # stub the crypto prove; exercise preflight/tracegen/debug + chaining
        class _FakeProof:
            def __init__(self, ctxs):
                self.ctxs = ctxs

        def fake_prove(pk, ctxs):
            from openvm_tpu.stark.debug import check_constraints
            check_constraints(pk, ctxs)
            segments.append(ctxs)
            return _FakeProof(ctxs)

        M.stark_prove = fake_prove
    try:
        proofs, final_tree = vm.prove_continuations(
            exe, max_insns_per_segment=40)
    finally:
        M.stark_prove = orig

    assert len(proofs) >= 2, "expected multiple segments"

    if os.environ.get("OPENVM_SLOW"):
        result = vm.verify_segments(proofs, exe,
                                    expected_exe_commit=vm.commit_exe(exe))
        proof_pv = pv_proof(final_tree, num_pv_words=8)
        assert list(np.asarray(proof_pv["root"])) == result["final_root"]
        assert verify_pv_proof(proof_pv)
        got = int.from_bytes(bytes(proof_pv["public_values"][:4]), "little")
        assert got == fib(21)
    else:
        # chain the stubbed segments manually: pc + root continuity
        def pvs_of(ctxs, name):
            return next(c for c in ctxs
                        if vm.airs[c.air_id].name == name).public_values

        init_root = [int(x) for x in vm.commit_init_memory(exe)]
        assert pvs_of(segments[0].ctxs if hasattr(segments[0], 'ctxs')
                      else segments[0], "memory_merkle")[:8] == init_root
        for i in range(len(segments) - 1):
            a = segments[i]
            b2 = segments[i + 1]
            assert pvs_of(a, "connector")[1] == pvs_of(b2, "connector")[0]
            assert pvs_of(a, "memory_merkle")[8:] == \
                pvs_of(b2, "memory_merkle")[:8]
            assert pvs_of(a, "connector")[2] == 42
        assert pvs_of(segments[-1], "connector")[2] == 0
        assert pvs_of(segments[-1], "connector")[3] == 1
        # final memory holds the revealed fibonacci value
        proof_pv = pv_proof(final_tree, num_pv_words=8)
        got = int.from_bytes(bytes(proof_pv["public_values"][:4]), "little")
        assert got == fib(21)
