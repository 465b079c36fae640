"""Pairing extension tests (SURVEY.md section 2.11).

Library layer mirrors the reference pairing guest lib + halo2curves shims
(`extensions/pairing/guest/src/halo2curves_shims`): Miller loop,
residue-witness final-exp hint (eprint 2024/640), pairing check on BN254
and BLS12-381.  VM layer: the HintFinalExp phantom on custom-1 funct3=011
(reference extensions/pairing/transpiler/src/lib.rs) exercised through E1
and preflight with hinted point input.
"""

import pytest

from openvm_tpu.pairing import (BLS12_381, BN254, final_exp_hint,
                                multi_miller_loop, pairing_check)
from openvm_tpu.pairing.final_exp import (_bls12_381_exponents,
                                          _bn254_exponents, _unity_root_27,
                                          hint_final_exp_bytes)
from openvm_tpu.pairing.miller import miller_add_step, miller_double_step
from openvm_tpu.pairing.tower import F12_ONE
from openvm_tpu.vm import Transpiler, VmExe
from openvm_tpu.vm.instructions import Program
from openvm_tpu.vm.interpreter import Interpreter
from tests.test_vm_prove import TERMINATE, asm_i, asm_s, reveal


def g1_neg(cv, P):
    return (P[0], (-P[1]) % cv.p)


def _scalar_mul_f2(cv, Q, k):
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc, _ = miller_double_step(cv, acc)
        if bit == "1":
            acc = Q if acc is None else miller_add_step(cv, acc, Q)[0]
    return acc


def g1_scalar_mul(cv, P, k):
    t = cv.tower
    r = _scalar_mul_f2(cv, (t.f2_embed(P[0]), t.f2_embed(P[1])), k)
    return (r[0][0], r[1][0])


def g2_scalar_mul(cv, Q, k):
    return _scalar_mul_f2(cv, Q, k)


# ---------------------------------------------------------------------------
# tower + exponent derivations
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cv", [BN254, BLS12_381], ids=lambda c: c.name)
def test_tower_ops(cv):
    t = cv.tower
    a = ((3, 1), (1, 2), (0, 5), (7, 0), (2, 2), (1, 1))
    assert t.f12_mul(a, t.f12_inv(a)) == F12_ONE
    # frobenius(a, 1) == a^p
    assert t.f12_frobenius(a, 1) == t.f12_pow(a, cv.p)
    assert t.f12_frobenius(a, 2) == t.f12_pow(a, cv.p ** 2 % (cv.p ** 12 - 1))
    # conjugation is the p^6 power map
    assert t.f12_conj(a) == t.f12_pow(a, pow(cv.p, 6, cv.p ** 12 - 1))


def test_bn254_exponent_relations():
    p, r, x = BN254.p, BN254.r, BN254.seed
    exp1, exp2, r_inv, m_inv = _bn254_exponents()
    h = p ** 12 - 1
    assert exp1 * 3 == h
    s = h // 27
    assert h % 27 == 0 and s % 3 != 0 and exp2 == (s + 1) // 3
    assert r_inv * r % (h // r) == 1
    lam = 6 * x + 2 + p ** 3 - p ** 2 + p
    assert m_inv * (lam // (3 * r)) % h == 1
    w27 = _unity_root_27()
    t = BN254.tower
    assert t.f12_pow(w27, 27) == F12_ONE
    assert t.f12_pow(w27, 9) != F12_ONE


def test_bls12_381_exponent_relations():
    p, r, x = BLS12_381.p, BLS12_381.r, BLS12_381.seed
    poly_factor, final_exp_factor, lam = _bls12_381_exponents()
    assert poly_factor == (1 - x) // 3
    assert 27 * poly_factor * final_exp_factor * r == p ** 12 - 1
    assert lam == p - x


# ---------------------------------------------------------------------------
# pairing checks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cv", [BN254, BLS12_381], ids=lambda c: c.name)
def test_pairing_check_valid(cv):
    P, Q = cv.g1, cv.g2
    assert pairing_check(cv, [P, g1_neg(cv, P)], [Q, Q])


@pytest.mark.parametrize("cv", [BN254, BLS12_381], ids=lambda c: c.name)
def test_pairing_bilinearity(cv):
    # e(aP, Q) * e(P, a*(-Q)) == 1
    t = cv.tower
    P, Q = cv.g1, cv.g2
    a = 7
    aP = g1_scalar_mul(cv, P, a)
    negQ = (Q[0], t.f2_neg(Q[1]))
    assert pairing_check(cv, [aP, P], [Q, g2_scalar_mul(cv, negQ, a)])


@pytest.mark.parametrize("cv", [BN254, BLS12_381], ids=lambda c: c.name)
def test_pairing_check_invalid_rejected(cv):
    P, Q = cv.g1, cv.g2
    assert not pairing_check(cv, [P, P], [Q, Q])


def test_bn254_residue_witness_identity():
    # Theorem 3 (eprint 2024/640): c^lambda == f * u for a pairing-trivial
    # f (the witness exists exactly when f^((p^12-1)/r) == 1)
    cv = BN254
    t = cv.tower
    P, Q = cv.g1, cv.g2
    f = multi_miller_loop(cv, [P, g1_neg(cv, P)], [Q, Q])
    c, u = final_exp_hint(cv, f)
    lam = 6 * cv.seed + 2 + cv.p - cv.p ** 2 + cv.p ** 3
    assert t.f12_pow(c, lam) == t.f12_mul(f, u)


def test_bls12_381_hint_identity():
    # gnark relation: f * s == c^(q - x) for a pairing-trivial f
    cv = BLS12_381
    t = cv.tower
    P, Q = cv.g1, cv.g2
    f = multi_miller_loop(cv, [P, g1_neg(cv, P)], [Q, Q])
    c, s = final_exp_hint(cv, f)
    assert t.f12_pow(c, cv.p - cv.seed) == t.f12_mul(f, s)


# ---------------------------------------------------------------------------
# VM phantom (E1 + preflight)
# ---------------------------------------------------------------------------

BUF = 0x400     # hinted P||Q bytes land here
DESC_P = 0x600  # (p_ptr, p_len)
DESC_Q = 0x608  # (q_ptr, q_len)
OUT = 0x700     # hint readback (768 bytes for BN254)


def hint_storew(rd):
    return (0b001 << 12) | (rd << 7) | 0x0B


def hint_buffer(rd, rs1):
    return (1 << 20) | (rs1 << 15) | (0b001 << 12) | (rd << 7) | 0x0B


def pairing_hint_insn(rs1, rs2, pairing_idx=0):
    return ((pairing_idx * 16) << 25) | (rs2 << 20) | (rs1 << 15) \
        | (0b011 << 12) | 0x2B


def build_pairing_hint_program(n_points=2):
    cv = BN254
    n = cv.num_limbs
    p_bytes = n_points * 2 * n
    q_bytes = n_points * 4 * n
    hint_words = 2 * 12 * n // 4  # c + u
    words = [
        (0 << 20) | (0b011 << 12) | 0x0B,        # phantom hint_input
        asm_i(0x13, 1, 0, BUF - 4, 0),           # x1 = BUF-4 (len header)
        asm_i(0x13, 2, 0, (p_bytes + q_bytes + 4) // 4, 0),
        hint_buffer(1, 2),                       # read len + P||Q
        # descriptors
        asm_i(0x13, 3, 0, BUF, 0),               # p_ptr
        asm_i(0x13, 4, 0, n_points, 0),          # p_len (count)
        asm_i(0x13, 10, 0, DESC_P, 0),
        asm_s(2, 10, 3, 0),                      # sw x3, 0(x10)
        asm_s(2, 10, 4, 4),                      # sw x4, 4(x10)
        asm_i(0x13, 3, 0, BUF + p_bytes, 0),     # q_ptr
        asm_i(0x13, 11, 0, DESC_Q, 0),
        asm_s(2, 11, 3, 0),
        asm_s(2, 11, 4, 4),
        pairing_hint_insn(10, 11, pairing_idx=0),
        # read the hint back into OUT
        asm_i(0x13, 1, 0, OUT, 0),
        asm_i(0x13, 2, 0, hint_words, 0),
        hint_buffer(1, 2),
        asm_i(0x03, 8, 1, 0, 2),                 # lw x8, 0(OUT)
        reveal(8, 0, 0),
        TERMINATE,
    ]
    prog = Program(instructions=Transpiler().transpile(words), pc_base=0)
    return VmExe(program=prog, pc_start=0)


def _point_bytes(cv):
    n = cv.num_limbs
    P, Q = cv.g1, cv.g2
    ps = [P, g1_neg(cv, P)]
    qs = [Q, Q]
    data = b""
    for x, y in ps:
        data += x.to_bytes(n, "little") + y.to_bytes(n, "little")
    for (x0, x1), (y0, y1) in qs:
        data += x0.to_bytes(n, "little") + x1.to_bytes(n, "little")
        data += y0.to_bytes(n, "little") + y1.to_bytes(n, "little")
    return data, ps, qs


def test_hint_final_exp_phantom_e1():
    cv = BN254
    n = cv.num_limbs
    data, ps, qs = _point_bytes(cv)
    exe = build_pairing_hint_program()
    st = Interpreter(exe).execute(inputs=[list(data)])
    assert st.exit_code == 0
    f = multi_miller_loop(cv, ps, qs)
    c, u = final_exp_hint(cv, f)
    t = cv.tower
    expected = t.f12_to_bytes(c, n) + t.f12_to_bytes(u, n)
    assert bytes(st.memory[OUT:OUT + len(expected)]) == expected


def test_hint_final_exp_phantom_preflight():
    from openvm_tpu.vm.preflight import PreflightInterpreter

    cv = BN254
    n = cv.num_limbs
    data, ps, qs = _point_bytes(cv)
    exe = build_pairing_hint_program()
    pre = PreflightInterpreter(exe).execute([list(data)])
    assert pre.exit_code == 0
    f = multi_miller_loop(cv, ps, qs)
    c, _u = final_exp_hint(cv, f)
    assert pre.public_values[0:4] == list(cv.tower.f12_to_bytes(c, n)[0:4])


def test_hint_mismatched_lengths_rejected():
    from openvm_tpu.vm.interpreter import ExecutionError

    def rd(ptr, ln):
        # descriptor with p_len=1, q_len=2
        vals = {0: 64, 4: 1, 8: 0x100, 12: 2}
        if ptr in vals:
            return vals[ptr].to_bytes(ln, "little")
        return bytes(ln)

    with pytest.raises(ValueError, match="p_len=1 != q_len=2"):
        hint_final_exp_bytes(0, rd, 0, 8)


# ---------------------------------------------------------------------------
# Fp12 mod-builder expressions (reference fp12.rs tests)
# ---------------------------------------------------------------------------

def _f12_to_limb_inputs(t, vals, L=32):
    import numpy as np
    from openvm_tpu.vm.circuit.mod_builder import int_to_limbs
    out = []
    for el in vals:
        for c0, c1 in el:
            for v in (c0, c1):
                out.append(np.asarray([int_to_limbs(v, L)], dtype=np.uint64))
    return out


def test_fp12_mul_builder():
    from openvm_tpu.vm.circuit.fp12 import fp12_mul_builder
    from openvm_tpu.vm.circuit.mod_builder import int_to_limbs

    cv = BN254
    t = cv.tower
    eb, out_idx = fp12_mul_builder(cv.p, cv.xi, num_limbs=32)
    x = tuple((3 * i + 1, 5 * i + 2) for i in range(6))
    y = tuple((7 * i + 11, 2 * i + 13) for i in range(6))
    expected = t.f12_mul(x, y)
    var_vals, _aux = eb.fill(_f12_to_limb_inputs(t, [x, y]), [])
    got = []
    for k in range(0, 12, 2):
        c0 = var_vals[out_idx[k]]
        c1 = var_vals[out_idx[k + 1]]
        v0 = sum(int(c0[0, i]) << (8 * i) for i in range(32))
        v1 = sum(int(c1[0, i]) << (8 * i) for i in range(32))
        got.append((v0, v1))
    assert tuple(got) == expected


def test_fp12_mul_by_01234_builder():
    import numpy as np
    from openvm_tpu.vm.circuit.fp12 import Fp2Expr, Fp12Expr
    from openvm_tpu.vm.circuit.mod_builder import ExprBuilder
    from openvm_tpu.pairing.tower import F2_ONE, F2_ZERO

    cv = BN254
    t = cv.tower
    eb = ExprBuilder(cv.p, num_limbs=32)
    f = Fp12Expr(eb)
    xs = [Fp2Expr(eb) for _ in range(5)]
    z = f.mul_by_01234(xs, cv.xi)
    out_idx = [v.kw["idx"] for c in z.c for v in (c.c0, c.c1)]

    fv = tuple((3 * i + 1, 5 * i + 2) for i in range(6))
    xv = [(2 * i + 1, 9 * i + 4) for i in range(5)]
    sparse = (xv[0], xv[1], xv[2], xv[3], xv[4], F2_ZERO)
    expected = t.f12_mul(fv, sparse)
    var_vals, _ = eb.fill(_f12_to_limb_inputs(t, [fv, xv]), [])
    got = []
    for k in range(0, 12, 2):
        v0 = sum(int(var_vals[out_idx[k]][0, i]) << (8 * i)
                 for i in range(32))
        v1 = sum(int(var_vals[out_idx[k + 1]][0, i]) << (8 * i)
                 for i in range(32))
        got.append((v0, v1))
    assert tuple(got) == expected
