"""FriReducedOpening + VerifyBatch native chips (VERDICT r2 task 3).

The reference makes FRI inner products one opcode (FRI_REDUCED_OPENING,
reference extensions/native/compiler/src/lib.rs:196-199) and a whole Merkle
batch opening one instruction (VERIFY_BATCH,
extensions/native/circuit/src/extension/mod.rs:89-99,
circuit/src/poseidon2/README.md).  These tests drive the TPU-native chip
redesigns (vm/circuit/native.py FriReducedOpeningAir / VerifyBatchAir /
VerifyBatchInsideAir) through execution, the logical constraint debugger
and global bus balance; tamper cases must be rejected.
"""

import numpy as np
import pytest

import openvm_tpu.vm.machine as M
from openvm_tpu.field.babybear import ext_mul_int
from openvm_tpu.native_compiler.builder import Builder
from openvm_tpu.poseidon2 import Poseidon2Host
from openvm_tpu.stark import FriParameters, StarkConfig
from openvm_tpu.vm.interpreter import ExecutionError
from openvm_tpu.vm.machine import NativeConfig, VirtualMachine
from openvm_tpu.vm.preflight import PreflightInterpreter

P = 2013265921
TEST_STARK = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                           proof_of_work_bits=1))
_host = Poseidon2Host()


def _perm(x):
    return [int(v) for v in _host.permute(np.asarray(x, dtype=np.uint64))]


def _hash_seg(vals):
    st = [0] * 16
    for c0 in range(0, len(vals), 8):
        chunk = list(vals[c0:c0 + 8])
        st = _perm(chunk + st[len(chunk):])
    return st[:8]


def _compress(left, right):
    return _perm(list(left) + list(right))[:8]


def _debug_check(exe):
    """Run prove up to (and including) the logical constraint debugger +
    LogUp bus balance, skipping the crypto prove (suite-speed policy of
    the extension chips, see tests/test_vm_keccak.py)."""
    vm = VirtualMachine(NativeConfig(stark=TEST_STARK))
    vm.keygen()
    orig = M.stark_prove
    M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        vm.prove(exe, debug=True)
    except SystemExit:
        return
    finally:
        M.stark_prove = orig


def _fri_expected(a_vals, b_exts, alpha):
    acc, apow = (0, 0, 0, 0), (1, 0, 0, 0)
    for t, (av, bv) in enumerate(zip(a_vals, b_exts)):
        diff = ((bv[0] - av) % P, bv[1], bv[2], bv[3])
        term = ext_mul_int(apow, diff)
        acc = tuple((acc[k] + term[k]) % P for k in range(4))
        apow = ext_mul_int(apow, tuple(alpha))
    return acc


def test_fri_reduced_opening_debug_checks():
    b = Builder()
    L = 5
    alpha = (3, 1, 0, 2)
    a_vals = [10 + t for t in range(L)]
    b_exts = [[(100 + 7 * t + k) % P for k in range(4)] for t in range(L)]
    a_arr, b_arr = b.array(L), b.array(4 * L)
    for t in range(L):
        b.mov(a_vals[t], a_arr.felt(t))
        for k in range(4):
            b.mov(b_exts[t][k], b_arr.felt(4 * t + k))
    res = b.fri_reduced_opening(a_arr, b_arr, L, b.econst(alpha))
    want = _fri_expected(a_vals, b_exts, alpha)
    for k in range(4):
        b.assert_eq(res.felt(k), int(want[k]))
    # length-1 edge case
    res1 = b.fri_reduced_opening(a_arr, b_arr, 1, b.econst(alpha))
    w1 = _fri_expected(a_vals[:1], b_exts[:1], alpha)
    for k in range(4):
        b.assert_eq(res1.felt(k), int(w1[k]))
    b.halt(0)
    _debug_check(b.compile())


def test_fri_reduced_opening_wrong_result_rejected():
    b = Builder()
    a_arr, b_arr = b.array(2), b.array(8)
    for t in range(2):
        b.mov(5 + t, a_arr.felt(t))
        for k in range(4):
            b.mov(50 + 4 * t + k, b_arr.felt(4 * t + k))
    res = b.fri_reduced_opening(a_arr, b_arr, 2, b.econst((2, 0, 0, 0)))
    want = _fri_expected([5, 6], [[50, 51, 52, 53], [54, 55, 56, 57]],
                         (2, 0, 0, 0))
    # program asserts a WRONG value -> must exit nonzero
    b.assert_eq(res.felt(0), (int(want[0]) + 1) % P)
    b.halt(0)
    pre = PreflightInterpreter(b.compile(), 16).execute()
    assert pre.exit_code != 0


def _build_vb_scenario():
    """depth-3 batch: segments at level 0 (len 11) and level 2 (len 3)."""
    seg0 = [(7 * i + 1) % P for i in range(11)]
    seg2 = [97, 98, 99]
    sibs = [[(i * 13 + s + 5) % P for i in range(8)] for s in range(3)]
    bits = [1, 0, 1]
    node = _hash_seg(seg0)
    for s in range(3):
        node = (_compress(sibs[s], node) if bits[s]
                else _compress(node, sibs[s]))
        if s + 1 == 2:
            node = _compress(node, _hash_seg(seg2))
    return seg0, seg2, sibs, bits, node


def _emit_vb(b, seg0, seg2, sibs, bits, commit):
    a0 = b.array(len(seg0))
    for i, v in enumerate(seg0):
        b.mov(v, a0.felt(i))
    a2 = b.array(len(seg2))
    for i, v in enumerate(seg2):
        b.mov(v, a2.felt(i))
    sib_arr = b.array(24)
    for s in range(3):
        for k in range(8):
            b.mov(sibs[s][k], sib_arr.felt(8 * s + k))
    bit_arr = b.array(3)
    for s in range(3):
        b.mov(bits[s], bit_arr.felt(s))
    comm_arr = b.array(8)
    for k in range(8):
        b.mov(commit[k], comm_arr.felt(k))
    desc = b.write_batch_descriptor(
        {0: (a0.addr, len(seg0)), 2: (a2.addr, len(seg2))}, 3)
    b.verify_batch(desc, sib_arr, bit_arr.addr, comm_arr.addr, 3,
                   inside_rows=3)


def test_verify_batch_debug_checks():
    seg0, seg2, sibs, bits, commit = _build_vb_scenario()
    b = Builder()
    _emit_vb(b, seg0, seg2, sibs, bits, commit)
    # depth-0 edge case: single segment, commitment = its hash
    a2 = b.array(3)
    for i, v in enumerate(seg2):
        b.mov(v, a2.felt(i))
    c0 = _hash_seg(seg2)
    c0_arr = b.array(8)
    for k in range(8):
        b.mov(c0[k], c0_arr.felt(k))
    b.verify_batch(b.write_batch_descriptor({0: (a2.addr, 3)}, 0),
                   b.array(8), 0, c0_arr.addr, 0, inside_rows=1)
    b.halt(0)
    _debug_check(b.compile())


def test_verify_batch_tampered_commit_rejected():
    seg0, seg2, sibs, bits, commit = _build_vb_scenario()
    bad = list(commit)
    bad[3] = (bad[3] + 1) % P
    b = Builder()
    _emit_vb(b, seg0, seg2, sibs, bits, bad)
    b.halt(0)
    with pytest.raises(ExecutionError, match="commitment mismatch"):
        PreflightInterpreter(b.compile(), 16).execute()


def test_verify_batch_tampered_sibling_rejected():
    seg0, seg2, sibs, bits, commit = _build_vb_scenario()
    sibs = [list(s) for s in sibs]
    sibs[1][0] = (sibs[1][0] + 1) % P
    b = Builder()
    _emit_vb(b, seg0, seg2, sibs, bits, commit)
    b.halt(0)
    with pytest.raises(ExecutionError, match="commitment mismatch"):
        PreflightInterpreter(b.compile(), 16).execute()
