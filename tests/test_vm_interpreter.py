"""Transpiler + E1 interpreter tests (hand-assembled + real guest ELF)."""

import os

import pytest

from openvm_tpu.vm import Interpreter, Transpiler, VmExe, load_elf, transpile_elf
from openvm_tpu.vm.instructions import Program

GUESTS = "/root/reference/benchmarks/guest"


def asm_r(op, rd, rs1, rs2, f3, f7):
    return (f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | op


def asm_i(op, rd, rs1, imm, f3):
    return ((imm & 0xFFF) << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | op


def run_words(words, pc_start=0):
    exe = VmExe(program=Program(
        instructions=Transpiler().transpile(words), pc_base=0),
        pc_start=pc_start)
    return Interpreter(exe).execute()


def test_alu_and_terminate():
    words = [
        asm_i(0x13, 1, 0, 7, 0),        # addi x1, x0, 7
        asm_i(0x13, 2, 0, -3, 0),       # addi x2, x0, -3
        asm_r(0x33, 3, 1, 2, 0, 0),     # add x3, x1, x2  -> 4
        asm_r(0x33, 4, 1, 2, 0, 0x20),  # sub x4, x1, x2  -> 10
        asm_r(0x33, 5, 1, 2, 2, 0),     # slt x5, x1, x2  -> 0 (7 < -3 false)
        asm_r(0x33, 6, 1, 2, 3, 0),     # sltu x6, x1, x2 -> 1
        0x0000000B,                     # custom-0 terminate(0)
    ]
    st = run_words(words)
    assert st.exit_code == 0
    assert st.regs[3] == 4
    assert st.regs[4] == 10
    assert st.regs[5] == 0
    assert st.regs[6] == 1
    assert st.regs[2] == 0xFFFFFFFD


def test_mul_div():
    words = [
        asm_i(0x13, 1, 0, -6, 0),       # x1 = -6
        asm_i(0x13, 2, 0, 4, 0),        # x2 = 4
        asm_r(0x33, 3, 1, 2, 0, 1),     # mul -> -24
        asm_r(0x33, 4, 1, 2, 4, 1),     # div -> -1 (trunc)
        asm_r(0x33, 5, 1, 2, 6, 1),     # rem -> -2
        asm_r(0x33, 6, 1, 0, 4, 1),     # div by zero -> all ones
        0x0000000B,
    ]
    st = run_words(words)
    assert st.regs[3] == (-24) & 0xFFFFFFFF
    assert st.regs[4] == (-1) & 0xFFFFFFFF
    assert st.regs[5] == (-2) & 0xFFFFFFFF
    assert st.regs[6] == 0xFFFFFFFF


def test_memory_roundtrip():
    words = [
        asm_i(0x13, 1, 0, 0x123, 0),    # x1 = 0x123
        # sw x1, 16(x0)
        (0 << 25) | (1 << 20) | (0 << 15) | (2 << 12) | (16 << 7) | 0x23,
        asm_i(0x03, 2, 0, 16, 2),       # lw x2, 16(x0)
        asm_i(0x03, 3, 0, 16, 0),       # lb x3, 16(x0) -> 0x23
        0x0000000B,
    ]
    st = run_words(words)
    assert st.regs[2] == 0x123
    assert st.regs[3] == 0x23


def test_branch_loop():
    # for (x1 = 0; x1 != 5; x1++); terminate
    words = [
        asm_i(0x13, 1, 0, 0, 0),
        asm_i(0x13, 2, 0, 5, 0),
        asm_i(0x13, 1, 1, 1, 0),        # addi x1, x1, 1
        # bne x1, x2, -4
        (0x7F << 25) | (2 << 20) | (1 << 15) | (1 << 12) | (0x79 << 7)
        | 0x63,
        0x0000000B,
    ]
    # encode bne properly: imm = -4
    imm = -4 & 0x1FFF
    words[3] = ((imm >> 12) << 31) | (((imm >> 5) & 0x3F) << 25) \
        | (2 << 20) | (1 << 15) | (1 << 12) | (((imm >> 1) & 0xF) << 8) \
        | (((imm >> 11) & 1) << 7) | 0x63
    st = run_words(words)
    assert st.exit_code == 0
    assert st.regs[1] == 5


@pytest.mark.skipif(not os.path.isdir(GUESTS), reason="no reference guests")
def test_real_fibonacci_recursive_guest():
    path = f"{GUESTS}/fibonacci_recursive/elf/openvm-fibonacci-recursive-program.elf"
    exe = transpile_elf(load_elf(open(path, "rb").read()))
    st = Interpreter(exe).execute()
    assert st.exit_code == 0
    pv = bytes(st.public_values.get(i, 0) for i in range(4))
    assert int.from_bytes(pv, "little") == 196418  # fib(27)


def test_cycle_tracker_spans():
    """CT_START/CT_END phantoms attribute instret spans to metrics
    (reference crates/vm/src/metrics/cycle_tracker role)."""
    from openvm_tpu import metrics
    from tests.test_vm_prove import TERMINATE, asm_i

    def ct(imm, rd=0):
        return ((imm & 0xFFF) << 20) | (rd << 7) | (0b011 << 12) | 0x0B

    words = [
        ct(0x10, rd=7),            # ct_start span 7
        asm_i(0x13, 5, 0, 1, 0),   # addi x5, x0, 1
        asm_i(0x13, 5, 5, 1, 0),   # addi x5, x5, 1
        asm_i(0x13, 5, 5, 1, 0),
        ct(0x11),                  # ct_end
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    exe = VmExe(program=prog, pc_start=0)
    metrics.reset()
    st = Interpreter(exe).execute()
    assert st.exit_code == 0
    snap = metrics.snapshot()
    spans = [e for e in snap.get("cycles", [])
             if e.get("cycle_tracker_span") == "ct_0x7"]
    assert len(spans) == 1
    assert spans[0]["value"] == 3  # the three ADDIs inside the span
