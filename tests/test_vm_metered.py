"""Metered (E2) execution + live trace-height segmentation.

The hybrid C++/Python preflight core accounts per-chip record counts,
total cells and interactions as it executes and trips a segment boundary
when a limit is crossed (reference metered execution,
crates/vm/src/arch/execution_mode/metered/segment_ctx.rs:6-10,135-217) —
segmentation is driven by live trace pressure, not an instruction budget.
Count-only mode allocates no record buffers (reference metered mode's
height counters).
"""

import os

import numpy as np

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from openvm_tpu.vm.memory_tree import pv_proof
from tests.test_vm_prove import FIB_EXECUTORS, build_fib_program, fib

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))


def test_count_only_heights_match_record_mode():
    exe = build_fib_program(30)
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=FIB_EXECUTORS))
    metered = vm.execute_metered(exe)

    # record-mode preflight gives the ground-truth heights
    from openvm_tpu.vm.native import NativeVmHandle
    from openvm_tpu.vm.preflight import PreflightInterpreter
    pre = PreflightInterpreter(exe).execute(nvm=NativeVmHandle(exe))
    assert metered["instret"] == pre.instret
    for air in vm.airs[vm.NUM_SYSTEM_AIRS:]:
        rec = pre.records.get(air.name)
        n = len(next(iter(rec.values()))) if rec else 1
        want = 1 << max((n - 1).bit_length(), 0)
        assert metered["chip_heights"][air.name] == want, air.name
    assert metered["fits_single_segment"]


def test_height_based_segmentation_splits_and_chains():
    """A long fib loop with a small max_height must auto-segment below
    the cap; segments chain (pc, memory root) and the final memory holds
    the right answer (reference should_segment, segment_ctx.rs:135-217).
    """
    exe = build_fib_program(400)
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, persistent=True,
                                   executors=FIB_EXECUTORS))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    segments = []

    def fake_prove(pk, ctxs):
        from openvm_tpu.stark.debug import check_constraints
        check_constraints(pk, ctxs)
        segments.append(ctxs)
        return ctxs

    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = fake_prove
    try:
        proofs, final_tree = vm.prove_continuations(
            exe, segment_limits={"max_height": 256, "check_insns": 16})
    finally:
        M.stark_prove = orig

    assert len(proofs) >= 3, "small height cap must force segmentation"
    if not os.environ.get("OPENVM_SLOW"):
        def pvs_of(ctxs, name):
            return next(c for c in ctxs
                        if vm.airs[c.air_id].name == name).public_values

        init_root = [int(x) for x in vm.commit_init_memory(exe)]
        assert pvs_of(segments[0], "memory_merkle")[:8] == init_root
        for i in range(len(segments) - 1):
            assert pvs_of(segments[i], "connector")[1] == \
                pvs_of(segments[i + 1], "connector")[0]
            assert pvs_of(segments[i], "memory_merkle")[8:] == \
                pvs_of(segments[i + 1], "memory_merkle")[:8]
            assert pvs_of(segments[i], "connector")[2] == 42
        assert pvs_of(segments[-1], "connector")[2] == 0

        # every segment's executor heights respect the cap (modulo the
        # 16-insn check quantum: <= 1 extra row per insn per chip)
        for ctxs in segments:
            for c in ctxs:
                name = vm.airs[c.air_id].name
                if name in ("program", "range_checker", "bitwise_lookup"):
                    continue
                assert len(c.common_main) <= 512, (name, len(c.common_main))
    proof_pv = pv_proof(final_tree, num_pv_words=8)
    got = int.from_bytes(bytes(proof_pv["public_values"][:4]), "little")
    assert got == fib(401) % (1 << 32)


def test_hybrid_segment_resume_matches_python():
    """Multi-segment hybrid preflight (C++ memory persists across
    segment_reset) must produce byte-identical per-segment results to the
    pure-Python suspend/resume path."""
    from openvm_tpu.vm.native import NativeVmHandle
    from openvm_tpu.vm.preflight import PreflightInterpreter

    exe = build_fib_program(25)
    interp = PreflightInterpreter(exe)

    # python path
    py_results = []
    state = None
    while True:
        pre = interp.execute(max_insns=40, state=state)
        py_results.append(pre)
        if pre.exit_code is not None:
            break
        state = pre.suspended_state

    # hybrid path
    nvm = NativeVmHandle(exe)
    nat_results = []
    state = None
    while True:
        pre = interp.execute(max_insns=40, state=state, nvm=nvm)
        nat_results.append(pre)
        if pre.exit_code is not None:
            break
        state = pre.suspended_state
        nvm.segment_reset()

    assert len(py_results) == len(nat_results) >= 2
    for py, nat in zip(py_results, nat_results):
        assert py.final_pc == nat.final_pc
        assert py.final_ts == nat.final_ts
        assert py.exit_code == nat.exit_code
        assert py.exec_counts == nat.exec_counts
        assert py.touched == nat.touched
        assert py.public_values == nat.public_values
        assert set(py.records) == set(nat.records)
        for chip in py.records:
            for f in py.records[chip]:
                assert np.array_equal(py.records[chip][f],
                                      nat.records[chip][f]), (chip, f)
