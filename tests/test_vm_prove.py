"""End-to-end VM proving: hand-assembled RV32IM program -> STARK proof.

The round-1 equivalent of the reference's `air_test` with a real guest
(SURVEY.md section 4 item 2): transpile -> preflight -> tracegen -> prove ->
verify, plus VM-level checks (exit code, program commitment).
"""

import numpy as np
import pytest

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))


def asm_r(op, rd, rs1, rs2, f3, f7):
    return (f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | op


def asm_i(op, rd, rs1, imm, f3):
    return ((imm & 0xFFF) << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | op


def asm_b(f3, rs1, rs2, imm):
    imm &= 0x1FFF
    return (((imm >> 12) & 1) << 31) | (((imm >> 5) & 0x3F) << 25) \
        | (rs2 << 20) | (rs1 << 15) | (f3 << 12) | (((imm >> 1) & 0xF) << 8) \
        | (((imm >> 11) & 1) << 7) | 0x63


def asm_s(f3, rs1, rs2, imm):
    imm &= 0xFFF
    return ((imm >> 5) << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) \
        | ((imm & 0x1F) << 7) | 0x23


def asm_jal(rd, imm):
    imm &= 0x1FFFFF
    return (((imm >> 20) & 1) << 31) | (((imm >> 1) & 0x3FF) << 21) \
        | (((imm >> 11) & 1) << 20) | (((imm >> 12) & 0xFF) << 12) \
        | (rd << 7) | 0x6F


def reveal(rs1, rd, imm):
    return ((imm & 0xFFF) << 20) | (rs1 << 15) | (0b010 << 12) | (rd << 7) \
        | 0x0B


TERMINATE = 0x0000000B


def build_fib_program(n=10):
    words = [
        asm_i(0x13, 1, 0, 0, 0),    # x1 = 0 (a)
        asm_i(0x13, 2, 0, 1, 0),    # x2 = 1 (b)
        asm_i(0x13, 3, 0, n, 0),    # x3 = n
        # loop:
        asm_r(0x33, 4, 1, 2, 0, 0),  # x4 = a + b
        asm_i(0x13, 1, 2, 0, 0),     # a = b
        asm_i(0x13, 2, 4, 0, 0),     # b = x4
        asm_i(0x13, 3, 3, -1, 0),    # n -= 1
        asm_b(1, 3, 0, -16),         # bne n, x0, loop
        # memory + misc op coverage
        asm_s(2, 0, 2, 100),         # sw x2, 100(x0)
        asm_i(0x03, 6, 0, 100, 2),   # lw x6, 100(x0)
        asm_s(0, 0, 2, 104),         # sb x2, 104(x0)
        asm_i(0x03, 7, 0, 104, 4),   # lbu x7, 104(x0)
        asm_r(0x33, 8, 1, 2, 3, 0),  # sltu x8, x1, x2
        asm_b(6, 1, 2, 8),           # bltu x1, x2, +8 (taken)
        asm_i(0x13, 2, 2, 77, 0),    # (skipped)
        0x000012B7,                  # lui x5, 1
        asm_jal(9, 8),               # jal x9, +8
        asm_i(0x13, 2, 2, 99, 0),    # (skipped)
        0x00000617,                  # auipc x12, 0
        asm_i(0x67, 11, 12, 12, 0),  # jalr x11, x12, 12 -> auipc_pc+12
        asm_i(0x13, 2, 2, 55, 0),    # (skipped by jalr)
        reveal(6, 0, 0),             # reveal x6 at pv index 0
        reveal(7, 0, 4),             # reveal x7 at pv index 1
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, a + b
    return a


FIB_EXECUTORS = ("alu", "lt", "beq", "blt", "jal_lui", "jalr", "auipc",
                 "loadstore")


def test_vm_fib_prove_verify():
    exe = build_fib_program(10)
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=FIB_EXECUTORS))
    vm.keygen()
    commit = vm.commit_exe(exe)
    proof, pre = vm.prove(exe)
    assert pre.exit_code == 0
    result = vm.verify(proof, expected_exe_commit=commit)
    pvs = result["public_values"]
    got = int(pvs[0]) | (int(pvs[1]) << 8) | (int(pvs[2]) << 16) \
        | (int(pvs[3]) << 24)
    assert got == fib(11)  # x2 after loop = fib(n+1)
    assert pvs[4] == fib(11) & 0xFF  # lbu byte

    # negative: tampering with a public value must fail verification
    pv_air = proof.per_air[vm.air_index["public_values"]]
    pv_air.public_values[0] = (pv_air.public_values[0] + 1) % (2**31)
    from openvm_tpu.stark import VerificationError
    with pytest.raises((VerificationError, AssertionError)):
        vm.verify(proof)
