"""Fp2 (complex extension field) chip tests over the BN254 prime.

Mirrors reference extensions/algebra fp2 tests (SURVEY.md section 2.9).
"""

import os

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.circuit.fp2 import fp2_div, fp2_mul
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.interpreter import Interpreter
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from tests.test_vm_bigint import hint_storew
from tests.test_vm_prove import TERMINATE, asm_i, reveal

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

BN254_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583

A0 = 0x1234_5678_9ABC_DEF0_1111_2222_3333_4444_5555_6666_7777_8888_9999_AAAA_BBBB_CCCC % BN254_P
A1 = 0x0FED_CBA9_8765_4321_AAAA_BBBB_CCCC_DDDD_EEEE_FFFF_0000_1111_2222_3333_4444_5555 % BN254_P
B0 = 0x0101_0202_0303_0404_0505_0606_0707_0808_0909_0A0A_0B0B_0C0C_0D0D_0E0E_0F0F_1010 % BN254_P
B1 = 0x1111_2222_0000_0001_0000_0000_0000_0000_0000_0000_0000_0000_0000_0000_0000_0007 % BN254_P

PT_A, PT_B, PT_C = 0x200, 0x280, 0x300


def fp2_r(base_f7, rd, rs1, rs2, fp2_idx=0):
    return (((fp2_idx * 8 + base_f7) << 25) | (rs2 << 20) | (rs1 << 15)
            | (0b010 << 12) | (rd << 7) | 0x2B)


def build_fp2_program():
    words = [(0 << 20) | (0b011 << 12) | 0x0B]
    words += [asm_i(0x13, 1, 0, PT_A, 0), hint_storew(1)]
    for k in range(16):
        words += [asm_i(0x13, 1, 0, PT_A + 4 * k, 0), hint_storew(1)]
    for k in range(16):
        words += [asm_i(0x13, 1, 0, PT_B + 4 * k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 1, 0, PT_A, 0),
        asm_i(0x13, 2, 0, PT_B, 0),
        asm_i(0x13, 3, 0, PT_C, 0),
        fp2_r(4, 3, 1, 2),             # setup -> nop
        fp2_r(0, 3, 1, 2),             # c = a + b
        fp2_r(2, 3, 3, 2),             # c = (a+b) * b
        fp2_r(3, 3, 3, 2),             # c = c / b = a + b
        fp2_r(1, 3, 3, 2),             # c = c - b = a
        asm_i(0x03, 6, 3, 0, 2),
        reveal(6, 0, 0),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def hint_input():
    blob = (A0.to_bytes(32, "little") + A1.to_bytes(32, "little")
            + B0.to_bytes(32, "little") + B1.to_bytes(32, "little"))
    return [list(blob)]


def test_fp2_semantics():
    m0, m1 = fp2_mul(BN254_P, A0, A1, B0, B1)
    d0, d1 = fp2_div(BN254_P, m0, m1, B0, B1)
    assert (d0, d1) == (A0, A1)


def test_fp2_e1_execution():
    exe = build_fp2_program()
    st = Interpreter(exe, fp2=(BN254_P,)).execute(inputs=hint_input())
    assert st.exit_code == 0
    c0 = int.from_bytes(st.memory[PT_C:PT_C + 32], "little")
    c1 = int.from_bytes(st.memory[PT_C + 32:PT_C + 64], "little")
    assert (c0, c1) == (A0, A1)


def test_fp2_debug_constraints():
    exe = build_fp2_program()
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=("alu", "loadstore",
                                              "hintstore"),
                                   fp2=(BN254_P,)))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        proof, pre = vm.prove(exe, inputs=hint_input(), debug=True,
                              native=False)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig
    vm.verify(proof)
