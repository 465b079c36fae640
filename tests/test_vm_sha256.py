"""SHA-256 extension tests.

Mirrors reference extensions/sha256 tests (SURVEY.md section 2.7):
custom-0 funct3=0b100 funct7=1 sha256 intrinsic over hinted memory input,
checked via E1 execution, preflight records, host-vector equality against
hashlib, and the logical constraint debugger (incl. LogUp bus balance
across the sponge <-> compression-table bus).  Crypto prove is
OPENVM_SLOW-gated.
"""

import hashlib
import os

import pytest

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.circuit.sha256 import sha256
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.interpreter import Interpreter
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from tests.test_vm_prove import TERMINATE, asm_i, reveal

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

SRC = 0x400
DST = 0x7C0


def sha_r(rd, rs1, rs2):
    return ((1 << 25) | (rs2 << 20) | (rs1 << 15) | (0b100 << 12)
            | (rd << 7) | 0x0B)


def hint_storew(rd):
    return (0b001 << 12) | (rd << 7) | 0x0B


def build_sha_program(n_bytes):
    words = [(0 << 20) | (0b011 << 12) | 0x0B]
    words += [asm_i(0x13, 1, 0, SRC - 4, 0), hint_storew(1)]
    for k in range(0, n_bytes, 4):
        words += [asm_i(0x13, 1, 0, SRC + k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 5, 0, DST, 0),
        asm_i(0x13, 6, 0, SRC, 0),
        asm_i(0x13, 7, 0, n_bytes, 0),
        sha_r(5, 6, 7),
        asm_i(0x03, 8, 5, 0, 2),
        reveal(8, 0, 0),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def _inputs(data: bytes):
    return [list(data + bytes(-len(data) % 4))]


DATA = bytes(range(1, 51))  # 50 bytes: single block


def test_sha256_host_vectors():
    for m in (b"", b"abc", b"x" * 55, b"x" * 56, b"x" * 64, b"y" * 200):
        assert sha256(m) == hashlib.sha256(m).digest(), len(m)


def test_sha256_e1_execution():
    exe = build_sha_program(len(DATA))
    st = Interpreter(exe).execute(inputs=_inputs(DATA))
    assert st.exit_code == 0
    digest = hashlib.sha256(DATA).digest()
    assert bytes(st.memory[DST:DST + 32]) == digest


@pytest.mark.parametrize("n", [55, 56, 60, 64, 120, 130])
def test_sha256_e1_padding_boundaries(n):
    # n in [56, 63]: an extra pure-padding block is required
    data = bytes((5 * i + 1) & 0xFF for i in range(n))
    exe = build_sha_program(n)
    st = Interpreter(exe).execute(inputs=_inputs(data))
    assert st.exit_code == 0
    assert bytes(st.memory[DST:DST + 32]) == hashlib.sha256(data).digest()


def test_sha256_preflight_records():
    from openvm_tpu.vm.preflight import PreflightInterpreter

    data = bytes((3 * i) & 0xFF for i in range(60))  # C-block + pure pad
    exe = build_sha_program(len(data))
    pre = PreflightInterpreter(exe).execute(_inputs(data))
    assert pre.exit_code == 0
    sp = pre.records["sha256_sponge"]
    assert len(sp["pc"]) == 2
    assert list(sp["is_c"]) == [1, 0]
    assert list(sp["pad80prev"]) == [0, 1]
    assert list(sp["is_last"]) == [0, 1]
    digest = hashlib.sha256(data).digest()
    assert pre.public_values[0:4] == list(digest[0:4])


def test_sha256_debug_constraints():
    exe = build_sha_program(len(DATA))
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, sha256=True,
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


def test_sha256_debug_constraints_extra_pad_block():
    data = bytes((7 * i + 2) & 0xFF for i in range(58))  # C-kind block
    exe = build_sha_program(len(data))
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, sha256=True,
                                   executors=("alu", "loadstore",
                                              "hintstore")))
    vm.keygen()

    import openvm_tpu.vm.machine as M
    orig = M.stark_prove
    M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        vm.prove(exe, inputs=_inputs(data), debug=True, native=False)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig


def test_sha256_unaligned_source_proves():
    """Byte-aligned source buffers execute AND pass all constraints: the
    sponge reads a word window and selects at the byte offset in-circuit
    (access-adapter role; was a hard rejection)."""
    from openvm_tpu.vm.circuit.sha256 import sha256

    src_off = 1
    data = bytes((3 * i + 7) & 0xFF for i in range(130))  # 3 blocks
    pad = src_off + len(data)
    words = [(0 << 20) | (0b011 << 12) | 0x0B]
    words += [asm_i(0x13, 1, 0, SRC - 4, 0), hint_storew(1)]
    for k in range(0, pad, 4):
        words += [asm_i(0x13, 1, 0, SRC + k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 5, 0, DST, 0),
        asm_i(0x13, 6, 0, SRC + src_off, 0),
        asm_i(0x13, 7, 0, len(data), 0),
        sha_r(5, 6, 7),
        asm_i(0x03, 8, 5, 0, 2),
        reveal(8, 0, 0),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    exe = VmExe(program=prog, pc_start=0)
    inputs = _inputs(bytes(src_off) + data)
    st = Interpreter(exe).execute(inputs=inputs)
    assert st.exit_code == 0
    digest = sha256(data)
    assert bytes(st.memory[DST:DST + 32]) == digest

    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, sha256=True,
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


def test_sha256_unaligned_digest_pointer_proves():
    """A digest written to a byte-aligned address executes AND proves via
    the read-modify-write digest word window (write-side access-adapter
    role; was a hard rejection through round 4).  Same scheme as keccak
    (tests/test_vm_keccak.py::test_keccak_unaligned_digest_pointer_proves)."""
    from tests.test_vm_prove import asm_s

    dst_off = 3
    data = bytes((7 * i + 5) & 0xFF for i in range(30))
    words = [(0 << 20) | (0b011 << 12) | 0x0B]
    words += [asm_i(0x13, 1, 0, SRC - 4, 0), hint_storew(1)]
    for k in range(0, len(data), 4):
        words += [asm_i(0x13, 1, 0, SRC + k, 0), hint_storew(1)]
    words += [
        (0xABCDE << 12) | (2 << 7) | 0x37,     # lui  x2, 0xABCDE
        asm_i(0x13, 2, 2, 0x321, 0),           # addi x2, x2, 0x321
        asm_s(2, 0, 2, DST),                   # sentinel at window word 0
        asm_s(2, 0, 2, DST + 32),              # sentinel at window word 8
        asm_i(0x13, 5, 0, DST + dst_off, 0),   # x5 = dst (unaligned)
        asm_i(0x13, 6, 0, SRC, 0),
        asm_i(0x13, 7, 0, len(data), 0),
        sha_r(5, 6, 7),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    exe = VmExe(program=prog, pc_start=0)
    inputs = _inputs(data)
    st = Interpreter(exe).execute(inputs=inputs)
    assert st.exit_code == 0
    digest = hashlib.sha256(data).digest()
    assert bytes(st.memory[DST + dst_off:DST + dst_off + 32]) == digest
    # edge bytes keep previous values (0xABCDE321 -> LE [21 e3 cd ab])
    assert st.memory[DST] == 0x21 and st.memory[DST + 2] == 0xCD
    assert st.memory[DST + 35] == 0xAB

    vm = VirtualMachine(Rv32Config(stark=TEST_STARK, sha256=True,
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
