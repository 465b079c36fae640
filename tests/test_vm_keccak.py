"""Keccak256 extension tests.

Mirrors reference extensions/keccak256 tests (SURVEY.md section 2.6):
custom-0 funct3=0b100 keccak256 intrinsic over hinted memory input, checked
via E1 execution, preflight records, host-vector equality, and the logical
constraint debugger (incl. LogUp bus balance across the sponge <-> keccakf
bus).  Crypto prove is OPENVM_SLOW-gated.
"""

import os

import pytest

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.circuit.keccak import keccak256
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.interpreter import Interpreter
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from tests.test_vm_prove import TERMINATE, asm_i, asm_s, reveal

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

# ADDI immediates are 12-bit signed: keep addresses < 2^11
SRC = 0x400
DST = 0x7C0


def keccak_r(rd, rs1, rs2):
    return ((0 << 25) | (rs2 << 20) | (rs1 << 15) | (0b100 << 12)
            | (rd << 7) | 0x0B)


def hint_storew(rd):
    return (0b001 << 12) | (rd << 7) | 0x0B


def build_keccak_program(n_bytes):
    words = [(0 << 20) | (0b011 << 12) | 0x0B]          # phantom hint_input
    words += [asm_i(0x13, 1, 0, SRC - 4, 0), hint_storew(1)]  # len header
    for k in range(0, n_bytes, 4):
        words += [asm_i(0x13, 1, 0, SRC + k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 5, 0, DST, 0),     # x5 = dst
        asm_i(0x13, 6, 0, SRC, 0),     # x6 = src
        asm_i(0x13, 7, 0, n_bytes, 0),  # x7 = len
        keccak_r(5, 6, 7),
        asm_i(0x03, 8, 5, 0, 2),       # lw x8, 0(x5): digest word 0
        asm_i(0x03, 9, 5, 28, 2),      # lw x9, 28(x5): digest word 7
        reveal(8, 0, 0),
        reveal(9, 0, 4),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def _inputs(data: bytes):
    padded = data + bytes(-len(data) % 4)
    return [list(padded)]


DATA = bytes(range(1, 101))  # 100 bytes: single block with padding


def test_keccak_host_vectors():
    assert keccak256(b"").hex() == ("c5d2460186f7233c927e7db2dcc703c0"
                                    "e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == ("4e03657aea45a94fc7d47ba826c8d667"
                                       "c0d1e6e33a64a036ec44f58fa12d6c45")


def test_keccak_e1_execution():
    exe = build_keccak_program(len(DATA))
    st = Interpreter(exe).execute(inputs=_inputs(DATA))
    assert st.exit_code == 0
    digest = keccak256(DATA)
    assert bytes(st.memory[DST:DST + 32]) == digest
    assert st.regs[8] == int.from_bytes(digest[0:4], "little")
    assert st.regs[9] == int.from_bytes(digest[28:32], "little")


def test_keccak_e1_multiblock():
    data = bytes((7 * i + 3) & 0xFF for i in range(300))  # 3 blocks
    exe = build_keccak_program(len(data))
    st = Interpreter(exe).execute(inputs=_inputs(data))
    assert st.exit_code == 0
    assert bytes(st.memory[DST:DST + 32]) == keccak256(data)


def test_keccak_preflight_records():
    from openvm_tpu.vm.preflight import PreflightInterpreter

    data = bytes((3 * i + 1) & 0xFF for i in range(150))  # 2 blocks
    exe = build_keccak_program(len(data))
    pre = PreflightInterpreter(exe).execute(_inputs(data))
    assert pre.exit_code == 0
    sp = pre.records["keccak_sponge"]
    kf = pre.records["keccakf"]
    assert len(sp["pc"]) == 2 and len(kf["state_in"]) == 2
    assert list(sp["is_first"]) == [1, 0] and list(sp["is_last"]) == [0, 1]
    assert list(sp["rem"]) == [150, 14]
    digest = keccak256(data)
    assert pre.public_values[0:4] == list(digest[0:4])


def build_unaligned_keccak_program(n_bytes, src_off):
    """Hash n_bytes starting at the BYTE-aligned address SRC+src_off."""
    pad = src_off + n_bytes
    words = [(0 << 20) | (0b011 << 12) | 0x0B]          # phantom hint_input
    words += [asm_i(0x13, 1, 0, SRC - 4, 0), hint_storew(1)]  # len header
    for k in range(0, pad, 4):
        words += [asm_i(0x13, 1, 0, SRC + k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 5, 0, DST, 0),              # x5 = dst
        asm_i(0x13, 6, 0, SRC + src_off, 0),    # x6 = src (unaligned)
        asm_i(0x13, 7, 0, n_bytes, 0),          # x7 = len
        keccak_r(5, 6, 7),
        asm_i(0x03, 8, 5, 0, 2),
        reveal(8, 0, 0),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def test_keccak_unaligned_source_proves():
    """A guest hashing a byte-aligned (unaligned) buffer executes AND
    proves: the sponge chip reads a word window and selects at the byte
    offset in-circuit (access-adapter role; was a hard rejection)."""
    src_off = 3
    data = bytes((5 * i + 11) & 0xFF for i in range(150))  # 2 blocks
    exe = build_unaligned_keccak_program(len(data), src_off)
    inputs = _inputs(bytes(src_off) + data)
    st = Interpreter(exe).execute(inputs=inputs)
    assert st.exit_code == 0
    digest = keccak256(data)
    assert bytes(st.memory[DST:DST + 32]) == digest
    assert st.regs[8] == int.from_bytes(digest[0:4], "little")

    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, keccak=True,
                                   executors=("alu", "loadstore",
                                              "hintstore")))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        proof, pre = vm.prove(exe, inputs=inputs, debug=True, native=False)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig
    vm.verify(proof)
    assert pre.public_values[0:4] == list(digest[0:4])


def test_keccak_unaligned_digest_pointer_proves():
    """A digest written to a byte-aligned (unaligned) address executes AND
    proves: the sponge chip read-modify-writes a DIGEST_WORDS+1 word
    window, preserving previous memory bytes at the edges (write side of
    the access-adapter role; was a hard rejection through round 4)."""
    dst_off = 2
    data = bytes((3 * i + 7) & 0xFF for i in range(40))
    # prefill the dst window edge words so edge-byte preservation is real
    words = [(0 << 20) | (0b011 << 12) | 0x0B]          # phantom hint_input
    words += [asm_i(0x13, 1, 0, SRC - 4, 0), hint_storew(1)]  # len header
    for k in range(0, len(data), 4):
        words += [asm_i(0x13, 1, 0, SRC + k, 0), hint_storew(1)]
    words += [
        (0x12345 << 12) | (2 << 7) | 0x37,     # lui  x2, 0x12345
        asm_i(0x13, 2, 2, 0x678, 0),           # addi x2, x2, 0x678
        asm_s(2, 0, 2, DST),                   # sw at window word 0
        asm_s(2, 0, 2, DST + 32),              # sw at window word 8
        asm_i(0x13, 5, 0, DST + dst_off, 0),   # x5 = dst (unaligned)
        asm_i(0x13, 6, 0, SRC, 0),             # x6 = src
        asm_i(0x13, 7, 0, len(data), 0),       # x7 = len
        keccak_r(5, 6, 7),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    exe = VmExe(program=prog, pc_start=0)
    inputs = _inputs(data)
    st = Interpreter(exe).execute(inputs=inputs)
    assert st.exit_code == 0
    digest = keccak256(data)
    assert bytes(st.memory[DST + dst_off:DST + dst_off + 32]) == digest
    # edge bytes below dst and above dst+32 keep their previous value
    # (sentinel 0x12345678 -> LE bytes [0x78, 0x56, 0x34, 0x12])
    assert st.memory[DST] == 0x78 and st.memory[DST + 1] == 0x56
    assert st.memory[DST + 34] == 0x34 and st.memory[DST + 35] == 0x12

    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, keccak=True,
                                   executors=("alu", "jal_lui", "loadstore",
                                              "hintstore")))
    vm.keygen()
    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        proof, pre = vm.prove(exe, inputs=inputs, debug=True, native=False)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig
    vm.verify(proof)


def test_keccak_debug_constraints():
    exe = build_keccak_program(len(DATA))
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, keccak=True,
                                   executors=("alu", "loadstore",
                                              "hintstore")))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    if not os.environ.get("OPENVM_SLOW"):
        M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        proof, pre = vm.prove(exe, inputs=_inputs(DATA), debug=True,
                              native=False)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig
    vm.verify(proof)
