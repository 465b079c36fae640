"""ECC (short Weierstrass) extension tests: secp256k1 add/double.

Mirrors reference extensions/ecc tests (SURVEY.md section 2.10): E1
execution + preflight + logical constraint debugger over EC_ADD_NE and
EC_DOUBLE custom instructions; crypto prove OPENVM_SLOW-gated.
"""

import os

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.interpreter import Interpreter
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from tests.test_vm_bigint import hint_storew
from tests.test_vm_prove import TERMINATE, asm_i, reveal

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

SECP_P = (1 << 256) - (1 << 32) - 977
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

PT_A, PT_C, PT_D = 0x200, 0x280, 0x300


def ec_add(p1, p2):
    (x1, y1), (x2, y2) = p1, p2
    lam = (y2 - y1) * pow((x2 - x1) % SECP_P, -1, SECP_P) % SECP_P
    x3 = (lam * lam - x1 - x2) % SECP_P
    return x3, (lam * (x1 - x3) - y1) % SECP_P


def ec_double(pt):
    x1, y1 = pt
    lam = 3 * x1 * x1 * pow(2 * y1 % SECP_P, -1, SECP_P) % SECP_P
    x3 = (lam * lam - 2 * x1) % SECP_P
    return x3, (lam * (x1 - x3) - y1) % SECP_P


def sw_r(base_f7, rd, rs1, rs2, curve_idx=0):
    return (((curve_idx * 8 + base_f7) << 25) | (rs2 << 20) | (rs1 << 15)
            | (0b001 << 12) | (rd << 7) | 0x2B)


def build_ecc_program():
    words = [(0 << 20) | (0b011 << 12) | 0x0B]          # phantom hint_input
    words += [asm_i(0x13, 1, 0, PT_A, 0), hint_storew(1)]   # length scratch
    for k in range(16):
        words += [asm_i(0x13, 1, 0, PT_A + 4 * k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 1, 0, PT_A, 0),    # x1 = &G
        asm_i(0x13, 3, 0, PT_C, 0),    # x3 = &2G
        asm_i(0x13, 4, 0, PT_D, 0),    # x4 = &3G
        sw_r(2, 0, 0, 0),              # setup -> nop
        sw_r(1, 3, 1, 0),              # [x3] = double([x1]) = 2G
        sw_r(0, 4, 1, 3),              # [x4] = [x1] + [x3] = 3G
        asm_i(0x03, 6, 4, 0, 2),       # lw x6, 0(x4): 3G.x low word
        reveal(6, 0, 0),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def hint_input():
    blob = GX.to_bytes(32, "little") + GY.to_bytes(32, "little")
    return [list(blob)]


def test_ecc_e1_execution():
    exe = build_ecc_program()
    st = Interpreter(exe, curves=((SECP_P, 0),)).execute(inputs=hint_input())
    assert st.exit_code == 0
    g2 = ec_double((GX, GY))
    g3 = ec_add((GX, GY), g2)
    got_x2 = int.from_bytes(st.memory[PT_C:PT_C + 32], "little")
    got_y2 = int.from_bytes(st.memory[PT_C + 32:PT_C + 64], "little")
    got_x3 = int.from_bytes(st.memory[PT_D:PT_D + 32], "little")
    assert (got_x2, got_y2) == g2
    assert got_x3 == g3[0]


def test_ecc_preflight_records():
    from openvm_tpu.vm.preflight import PreflightInterpreter

    exe = build_ecc_program()
    pre = PreflightInterpreter(exe, curves=((SECP_P, 0),)).execute(
        hint_input())
    assert pre.exit_code == 0
    assert {"sw_add_ne_0", "sw_double_0"} <= set(pre.records)
    g3 = ec_add((GX, GY), ec_double((GX, GY)))
    assert pre.public_values[0:4] == [(g3[0] >> (8 * i)) & 255
                                      for i in range(4)]


def test_ecc_debug_constraints():
    exe = build_ecc_program()
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=("alu", "loadstore",
                                              "hintstore"),
                                   curves=((SECP_P, 0),)))
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
