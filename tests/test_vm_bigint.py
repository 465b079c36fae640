"""Int256 (bigint) extension: execution + preflight + constraint checks.

Mirrors the reference bigint extension tests (reference
extensions/bigint/circuit, SURVEY.md section 2.8): hand-assembled programs
using the custom-0 INT256 encodings exercise every 256-bit chip, checked by
(a) the E1 interpreter against python bignum semantics and (b) the logical
constraint debugger incl. bus balance; full crypto prove is OPENVM_SLOW.
"""

import os

import pytest

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.interpreter import Interpreter
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from tests.test_vm_prove import TERMINATE, asm_i, asm_s, reveal

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

M256 = (1 << 256) - 1

# funct7 encodings (reference Int256Funct7)
ADD, SUB, XOR, OR, AND, SLL, SRL, SRA, SLT, SLTU, MUL = range(11)


def int256_r(funct7, rd, rs1, rs2):
    return ((funct7 << 25) | (rs2 << 20) | (rs1 << 15) | (0b101 << 12)
            | (rd << 7) | 0x0B)


def beq256(rs1, rs2, imm):
    imm &= 0x1FFF
    return ((((imm >> 12) & 1) << 31) | (((imm >> 5) & 0x3F) << 25)
            | (rs2 << 20) | (rs1 << 15) | (0b110 << 12)
            | (((imm >> 1) & 0xF) << 8) | (((imm >> 11) & 1) << 7) | 0x0B)


A_VAL = 0xF1EE_0000_DDCC_BBAA_9988_7766_5544_3322_1100_FFEE_DDCC_BBAA_9988_7766_5544_3322
B_VAL = 0x0000_0001_0000_0000_0000_0000_0000_0000_FEDC_BA98_7654_3210_0123_4567_89AB_CDEF

PTR_A, PTR_B, PTR_C, PTR_D = 0x100, 0x140, 0x180, 0x1C0


def hint_storew(ptr_reg):
    return (0b001 << 12) | (ptr_reg << 7) | 0x0B


def build_bigint_program(ops):
    """Program skeleton: operands arrive via the hint stream (hint_storew
    writes words), then the given custom instructions run, then the low
    and high result words of [PTR_C] are revealed."""
    words = [(0 << 20) | (0b011 << 12) | 0x0B]          # phantom hint_input
    words += [asm_i(0x13, 1, 0, PTR_A, 0),              # x1 = &scratch
              hint_storew(1)]                           # length word
    for k in range(8):
        words += [asm_i(0x13, 1, 0, PTR_A + 4 * k, 0), hint_storew(1)]
    for k in range(8):
        words += [asm_i(0x13, 1, 0, PTR_B + 4 * k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 1, 0, PTR_A, 0),   # x1 = &a
        asm_i(0x13, 2, 0, PTR_B, 0),   # x2 = &b
        asm_i(0x13, 3, 0, PTR_C, 0),   # x3 = &c
        asm_i(0x13, 4, 0, PTR_D, 0),   # x4 = &d
    ]
    words += ops
    words += [
        asm_i(0x03, 6, 3, 0, 2),       # lw x6, 0(x3)
        reveal(6, 0, 0),
        asm_i(0x03, 7, 3, 28, 2),      # lw x7, 28(x3)
        reveal(7, 0, 4),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def hint_input_for(a, b):
    """One input: 64 bytes = a || b little-endian (+4-byte length header
    consumed by the first hint_storew as scratch)."""
    blob = a.to_bytes(32, "little") + b.to_bytes(32, "little")
    return [list(blob)]


def run_e1(exe, inputs):
    st = Interpreter(exe).execute(inputs=inputs)
    return st


ALL_OPS = [
    int256_r(ADD, 3, 1, 2),        # c = a + b
    int256_r(SUB, 4, 3, 2),        # d = c - b (= a)
    int256_r(XOR, 4, 4, 2),        # d = a ^ b
    int256_r(OR, 4, 1, 2),         # d = a | b
    int256_r(AND, 4, 1, 2),        # d = a & b
    int256_r(MUL, 4, 1, 2),        # d = a * b
    int256_r(SLT, 4, 1, 2),
    int256_r(SLTU, 4, 1, 2),
    int256_r(SLL, 4, 1, 2),        # shift by b[0] = 0xEF & 255
    int256_r(SRL, 4, 1, 2),
    int256_r(SRA, 4, 1, 2),
    beq256(1, 2, 8),               # a != b: fall through
    int256_r(ADD, 3, 3, 4),        # c += d (reached)
    beq256(1, 1, 8),               # a == a: skip next
    int256_r(XOR, 3, 3, 3),        # (skipped; would zero c)
]


def expected_final_c():
    c = (A_VAL + B_VAL) & M256
    d = (A_VAL - (1 << 256) if A_VAL >> 255 else A_VAL) >> (B_VAL & 255)
    d &= M256
    return (c + d) & M256


def test_bigint_e1_execution():
    exe = build_bigint_program(ALL_OPS)
    st = run_e1(exe, hint_input_for(A_VAL, B_VAL))
    assert st.exit_code == 0
    c = int.from_bytes(st.memory[PTR_C:PTR_C + 32], "little")
    assert c == expected_final_c()


def test_bigint_ops_semantics():
    """Each op standalone against python bignum reference."""
    cases = [
        (ADD, (A_VAL + B_VAL) & M256),
        (SUB, (A_VAL - B_VAL) & M256),
        (XOR, A_VAL ^ B_VAL),
        (OR, A_VAL | B_VAL),
        (AND, A_VAL & B_VAL),
        (MUL, (A_VAL * B_VAL) & M256),
        (SLT, int((A_VAL - (1 << 256)) < B_VAL)),  # a negative, b positive
        (SLTU, int(A_VAL < B_VAL)),
        (SLL, (A_VAL << (B_VAL & 255)) & M256),
        (SRL, A_VAL >> (B_VAL & 255)),
        (SRA, ((A_VAL - (1 << 256)) >> (B_VAL & 255)) & M256),
    ]
    for funct7, want in cases:
        exe = build_bigint_program([int256_r(funct7, 3, 1, 2)])
        st = run_e1(exe, hint_input_for(A_VAL, B_VAL))
        got = int.from_bytes(st.memory[PTR_C:PTR_C + 32], "little")
        assert got == want, f"funct7={funct7}"


def test_bigint_preflight_matches_e1():
    from openvm_tpu.vm.preflight import PreflightInterpreter

    exe = build_bigint_program(ALL_OPS)
    pre = PreflightInterpreter(exe).execute(hint_input_for(A_VAL, B_VAL))
    assert pre.exit_code == 0
    want = expected_final_c()
    assert pre.public_values[0:4] == [(want >> (8 * i)) & 255
                                      for i in range(4)]
    lo = {"int256_alu", "int256_mul", "int256_lt", "int256_shift",
          "int256_beq"}
    assert lo <= set(pre.records)


def test_bigint_native_e1_matches_python():
    """C++ E1 interpreter executes the int256 ops bit-identically."""
    from openvm_tpu.vm.native import NativeInterpreter

    exe = build_bigint_program(ALL_OPS)
    inputs = hint_input_for(A_VAL, B_VAL)
    py = run_e1(exe, inputs)
    nat = NativeInterpreter(exe).execute(inputs)
    assert nat.error is None
    assert nat.exit_code == py.exit_code == 0
    assert nat.instret == py.instret
    want = expected_final_c()
    pv = bytes(nat.public_values.get(i, 0) for i in range(4))
    assert int.from_bytes(pv, "little") == want & 0xFFFFFFFF


def test_bigint_debug_constraints():
    """All six 256-bit AIRs through the logical debugger + bus balance."""
    from openvm_tpu.vm.instructions import (BranchLessThan256Opcode,
                                            Instruction)

    # sentinel gets swapped for a BLT256 (no RISC-V encoding exists for it;
    # reference reaches branch-lt-256 via compare+branch lowering)
    exe = build_bigint_program(ALL_OPS + [int256_r(SLT, 4, 1, 2),
                                          int256_r(ADD, 3, 3, 4)])
    idx = len(exe.program.instructions) - 7  # the SLT sentinel
    assert exe.program.instructions[idx].opcode == 0x408
    exe.program.instructions[idx] = Instruction(
        BranchLessThan256Opcode.BLT, a=4 * 1, b=4 * 2, c=8, d=1, e=2)
    # a < b signed (a negative): taken, skipping the trailing ADD
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=("alu", "loadstore",
                                              "hintstore"),
                                   bigint=True))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        proof, pre = vm.prove(exe, inputs=hint_input_for(A_VAL, B_VAL),
                              debug=True, native=False)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig
    vm.verify(proof)
