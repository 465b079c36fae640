"""Native (recursion) VM tests.

Mirrors reference extensions/native/circuit tests (SURVEY.md section 2.5):
felt/ext-felt arithmetic, native branches, loadstore with pointer-cell
indirection, hints, jal/range-check and the Poseidon2 adapter, checked via
preflight execution, semantic asserts, and the logical constraint debugger
(incl. LogUp bus balance).  Crypto prove is OPENVM_SLOW-gated (the debug
checker already validates every constraint row-by-row).
"""

import os

import pytest

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm.instructions import (FieldArithmeticOpcode as FA,
                                        FieldExtensionOpcode as FE,
                                        Instruction,
                                        NativeBranchEqOpcode as NB,
                                        NativeJalOpcode,
                                        NativeLoadStore4Opcode as NL4,
                                        NativeLoadStoreOpcode as NL,
                                        NativePhantom, NativeRangeCheckOpcode,
                                        Poseidon2Opcode, Program,
                                        SystemOpcode, VmExe, phantom)
from openvm_tpu.vm.machine import NativeConfig, VirtualMachine
from openvm_tpu.vm.preflight import PreflightInterpreter

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

I = Instruction


def build_native_program():
    """Exercises every native chip; semantics asserted in the tests."""
    prog = [
        # felt arith: [10] = 7 + 8 (imm/imm), then mul / div
        I(FA.ADD, a=10, b=7, c=8, d=4, e=0, f=0),
        I(FA.MUL, a=11, b=10, c=3, d=4, e=4, f=0),
        I(FA.DIV, a=12, b=11, c=10, d=4, e=4, f=4),   # = 3
        # ext field: x = (1,2,3,4) at 20..23, y = (5,6,7,8) at 24..27
        *[I(FA.ADD, a=20 + k, b=k + 1, c=0, d=4, e=0, f=0) for k in range(4)],
        *[I(FA.ADD, a=24 + k, b=k + 5, c=0, d=4, e=0, f=0) for k in range(4)],
        # z = x*y at 28; w = z/y at 32 (== x, so w[0] == 1)
        I(FE.BBE4MUL, a=28, b=20, c=24, d=4, e=4),
        I(FE.BBE4DIV, a=32, b=28, c=24, d=4, e=4),
        # branch: if [32] == 1 skip the bad write
        I(NB.BEQ, a=32, b=1, c=8, d=4, e=0),
        I(FA.ADD, a=15, b=999, c=0, d=4, e=0, f=0),
        # loadstore with pointer cell: [50] = 32; LOADW [40] = mem[[50]]
        I(FA.ADD, a=50, b=32, c=0, d=4, e=0, f=0),
        I(NL.LOADW, a=40, b=0, c=50, d=4, e=4, f=4),
        I(NL.STOREW, a=40, b=0, c=41, d=4, e=4, f=0),
        # hint: input vec [17, 23, 29]; stream = [3,17,23,29] -> 44..47
        phantom(NativePhantom.HINT_INPUT),
        I(NL4.HINT_STOREW4, a=0, b=0, c=44, d=4, e=4, f=0),
        # jal: [60] = pc+4, jump +8 (skip bad write)
        I(NativeJalOpcode.JAL, a=60, b=8, d=4),
        I(FA.ADD, a=15, b=888, c=0, d=4, e=0, f=0),
        # range check [44] (= 3) against 16/14 bit split
        I(NativeRangeCheckOpcode.RANGE_CHECK, a=44, b=15, c=14, d=4),
        # poseidon2 adapter: permute 64..79 -> 80..95, compress -> 96..103
        I(Poseidon2Opcode.PERM_POS2, a=80, b=64, c=0, d=4, e=4),
        I(Poseidon2Opcode.COMP_POS2, a=96, b=80, c=88, d=4, e=4),
        # publish pv[0] = [12]
        I(FA.ADD, a=0, b=12, c=0, d=3, e=4, f=0),
        I(SystemOpcode.TERMINATE, c=0),
    ]
    return VmExe(program=Program(instructions=prog), pc_start=0)


INPUTS = [[17, 23, 29]]


def test_native_preflight_semantics():
    exe = build_native_program()
    pre = PreflightInterpreter(exe, 16).execute(inputs=INPUTS)
    assert pre.exit_code == 0
    assert pre.touched[(4, 12)][0] == 3
    assert pre.touched[(4, 32)][0] == 1        # x0 of z/y == x0 of x
    assert pre.touched[(4, 40)][0] == 1
    assert pre.touched[(4, 41)][0] == 1
    assert pre.touched[(4, 44)][0] == 3        # hint len header
    assert pre.touched[(4, 45)][0] == 17 and pre.touched[(4, 46)][0] == 23
    assert (4, 15) not in pre.touched          # both bad writes skipped
    assert pre.touched[(3, 0)][0] == 3         # felt public value


def test_native_debug_constraints():
    exe = build_native_program()
    vm = VirtualMachine(NativeConfig(stark=TEST_STARK))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        proof, pre = vm.prove(exe, inputs=INPUTS, debug=True, native=False)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig
    vm.verify(proof, exe=exe)
    pv_air = vm.air_index["native_public_values"]
    assert proof.per_air[pv_air].public_values[0] == 3


def test_native_branch_taken_and_fallthrough():
    prog = [
        I(FA.ADD, a=1, b=5, c=0, d=4, e=0, f=0),
        I(NB.BNE, a=1, b=5, c=8, d=4, e=0),     # not taken
        I(FA.ADD, a=2, b=1, c=0, d=4, e=0, f=0),
        I(NB.BEQ, a=1, b=5, c=8, d=4, e=0),     # taken, skips bad write
        I(FA.ADD, a=3, b=7, c=0, d=4, e=0, f=0),
        I(SystemOpcode.TERMINATE, c=0),
    ]
    exe = VmExe(program=Program(instructions=prog), pc_start=0)
    pre = PreflightInterpreter(exe, 16).execute()
    assert pre.exit_code == 0
    assert pre.touched[(4, 2)][0] == 1
    assert (4, 3) not in pre.touched


def test_native_div_by_zero_rejected():
    prog = [I(FA.DIV, a=1, b=3, c=0, d=4, e=0, f=0),
            I(SystemOpcode.TERMINATE, c=0)]
    exe = VmExe(program=Program(instructions=prog), pc_start=0)
    with pytest.raises(Exception):
        PreflightInterpreter(exe, 16).execute()
