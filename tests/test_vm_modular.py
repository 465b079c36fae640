"""Modular-arithmetic (algebra) extension tests.

Mirrors reference extensions/algebra tests (SURVEY.md section 2.9): custom-1
encoded modular add/sub/mul/div/is_eq over secp256k1's prime, checked via E1
execution, preflight records, and the logical constraint debugger (incl.
LogUp bus balance).  Crypto prove is OPENVM_SLOW-gated.
"""

import os

from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.interpreter import Interpreter
from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from tests.test_vm_bigint import PTR_A, PTR_B, PTR_C, PTR_D, hint_storew
from tests.test_vm_prove import TERMINATE, asm_i, reveal

TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))

SECP_P = (1 << 256) - (1 << 32) - 977
ADD_F7, SUB_F7, MUL_F7, DIV_F7, ISEQ_F7, SETUP_F7 = range(6)

A_VAL = 0x3A1E_55D1_9F83_7C2B_11DD_0123_4567_89AB_CDEF_FEDC_BA98_7654_3210_0F0F_1E1E_2D2D % SECP_P
B_VAL = 0x0101_55D1_0000_7C2B_9F83_4567_0123_89AB_1234_5678_9ABC_DEF0_AAAA_BBBB_CCCC_0007 % SECP_P


def modular_r(base_f7, rd, rs1, rs2, mod_idx=0):
    return (((mod_idx * 8 + base_f7) << 25) | (rs2 << 20) | (rs1 << 15)
            | (0b000 << 12) | (rd << 7) | 0x2B)


def build_modular_program():
    words = [(0 << 20) | (0b011 << 12) | 0x0B]          # phantom hint_input
    words += [asm_i(0x13, 1, 0, PTR_A, 0), hint_storew(1)]  # length scratch
    for k in range(8):
        words += [asm_i(0x13, 1, 0, PTR_A + 4 * k, 0), hint_storew(1)]
    for k in range(8):
        words += [asm_i(0x13, 1, 0, PTR_B + 4 * k, 0), hint_storew(1)]
    words += [
        asm_i(0x13, 1, 0, PTR_A, 0),
        asm_i(0x13, 2, 0, PTR_B, 0),
        asm_i(0x13, 3, 0, PTR_C, 0),
        asm_i(0x13, 4, 0, PTR_D, 0),
        modular_r(SETUP_F7, 3, 1, 2),      # setup -> nop
        modular_r(ADD_F7, 3, 1, 2),        # c = a + b
        modular_r(SUB_F7, 4, 3, 2),        # d = c - b = a
        modular_r(MUL_F7, 3, 4, 2),        # c = a * b
        modular_r(DIV_F7, 4, 3, 2),        # d = c / b = a
        modular_r(ISEQ_F7, 28, 4, 1),      # x28 = (d == a) = 1
        asm_i(0x03, 6, 3, 0, 2),           # lw x6, 0(x3)
        reveal(6, 0, 0),
        reveal(28, 0, 4),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def hint_input():
    blob = A_VAL.to_bytes(32, "little") + B_VAL.to_bytes(32, "little")
    return [list(blob)]


def test_modular_e1_execution():
    exe = build_modular_program()
    st = Interpreter(exe, moduli=(SECP_P,)).execute(inputs=hint_input())
    assert st.exit_code == 0
    c = int.from_bytes(st.memory[PTR_C:PTR_C + 32], "little")
    d = int.from_bytes(st.memory[PTR_D:PTR_D + 32], "little")
    assert c == (A_VAL * B_VAL) % SECP_P
    assert d == A_VAL
    assert st.regs[28] == 1


def test_modular_preflight_records():
    from openvm_tpu.vm.preflight import PreflightInterpreter

    exe = build_modular_program()
    pre = PreflightInterpreter(exe, moduli=(SECP_P,)).execute(hint_input())
    assert pre.exit_code == 0
    assert {"modular_addsub_0", "modular_muldiv_0",
            "modular_iseq_0"} <= set(pre.records)
    want = (A_VAL * B_VAL) % SECP_P
    assert pre.public_values[0:4] == [(want >> (8 * i)) & 255
                                      for i in range(4)]
    assert pre.public_values[4] == 1  # is_eq result


def test_mod_builder_fill_roundtrip():
    """FieldExpr equation witness generation is self-consistent."""
    import numpy as np

    from openvm_tpu.vm.circuit.mod_builder import ExprBuilder

    eb = ExprBuilder(SECP_P, 32)
    x = eb.input()
    y = eb.input()
    f_mul = eb.flag()
    f_div = eb.flag()
    z = eb.new_var()
    eb.constrain_zero((x * y - z).flag_mul(f_mul)
                      + (z * y - x).flag_mul(f_div))

    rng = np.random.default_rng(0)
    n = 4
    xs = [int(rng.integers(0, 1 << 62)) * 3 % SECP_P for _ in range(n)]
    ys = [int(rng.integers(1, 1 << 62)) * 5 % SECP_P for _ in range(n)]
    flags_mul = np.asarray([1, 0, 1, 0], dtype=np.uint64)
    zs = []
    for i in range(n):
        if flags_mul[i]:
            zs.append(xs[i] * ys[i] % SECP_P)
        else:
            zs.append(xs[i] * pow(ys[i], -1, SECP_P) % SECP_P)

    def limbs(vals):
        return np.asarray([[(v >> (8 * i)) & 255 for i in range(32)]
                           for v in vals], dtype=np.uint64)

    var_vals, aux = eb.fill([limbs(xs), limbs(ys)],
                            [flags_mul, 1 - flags_mul],
                            var_results=[limbs(zs)])
    assert aux.shape == (n, eb.aux_width())


def test_modular_debug_constraints():
    exe = build_modular_program()
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=("alu", "loadstore",
                                              "hintstore"),
                                   moduli=(SECP_P,)))
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
