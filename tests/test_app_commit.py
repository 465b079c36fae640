"""AppExecutionCommit: the Bn254-facing 32-byte commitment pair
(reference crates/sdk/src/commit.rs:70-124) — the user-checkable half of
the documented halo2/EVM bridge (docs/DESIGN.md "Root layer")."""

import numpy as np

from openvm_tpu.guest.asm import Assembler, x
from openvm_tpu.sdk import (AppExecutionCommit, AppProvingKey,
                            _bn254_bytes_to_digest, _digest_to_bn254_bytes)
from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import memory_tree as mt
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine

P = 2013265921

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

def _tiny_exe():
    a = Assembler()
    a.addi(x[5], x[0], 7)
    a.addi(x[6], x[0], 35)
    a.add(x[7], x[5], x[6])
    a.terminate()
    return a.build()


def test_digest_bytes_roundtrip():
    digest = [1, 2013265920, 12345, 0, 999999999, 42, 7, 2013265919]
    b = _digest_to_bn254_bytes(digest)
    assert len(b) == 32
    assert _bn254_bytes_to_digest(b) == digest
    # base-P little-endian number, emitted big-endian (commit.rs:137-159)
    assert int.from_bytes(b, "big") == sum(d * P**i
                                           for i, d in enumerate(digest))
    # P^8 = 2^248 < Bn254Fr order => top byte is always 0
    assert b[0] == 0


def test_digest_bytes_pinned_vector():
    # golden vector: digest [1,0,...,0] is the number 1
    assert _digest_to_bn254_bytes([1] + [0] * 7) == bytes(31) + b"\x01"
    # digest [0,1,0,...] is P
    assert (int.from_bytes(_digest_to_bn254_bytes([0, 1] + [0] * 6), "big")
            == P)


def test_app_execution_commit_structure():
    """app_exe_commit follows compute_exe_commit's Merkle shape
    (program/trace.rs:96-164): compress(compress(H(prog), H(mem)),
    H(pc_pad))."""
    exe = _tiny_exe()
    vm = VirtualMachine(Rv32Config(persistent=True, stark=TEST_STARK))
    # no keygen needed: commit_exe/commit_init_memory are commitment-only
    app_pk = AppProvingKey(vm=vm, exe_commit=vm.commit_exe(exe), exe=exe)
    leaf_commit = np.arange(8, dtype=np.uint64)  # stand-in leaf commit
    com = AppExecutionCommit.compute(app_pk, leaf_commit)

    prog = [int(x) for x in np.asarray(app_pk.exe_commit, dtype=np.uint64)]
    init_root = [int(x) for x in vm.commit_init_memory(exe)]
    expect = mt.compress(
        mt.compress(mt.hash_leaf(prog), mt.hash_leaf(init_root)),
        mt.hash_leaf([int(exe.pc_start)] + [0] * 7))
    assert com.exe_commit_digest() == list(expect)
    assert com.vm_commit_digest() == list(range(8))
    assert len(com.app_exe_commit) == 32 and len(com.app_vm_commit) == 32
