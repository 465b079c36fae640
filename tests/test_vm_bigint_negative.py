"""Negative tests: tampered bigint traces must fail the debug checker.

Mirrors the reference's negative-test pattern (SURVEY.md section 4 item 1:
"disable constraint, expect verification failure", e.g.
crates/vm/src/system/memory/volatile/tests.rs) at the logical-debugger
level: corrupt one witness cell / drop one record and assert the
constraint or bus-balance check rejects.
"""

import numpy as np
import pytest

from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
from tests.test_vm_bigint import (ALL_OPS, A_VAL, B_VAL, TEST_STARK,
                                  build_bigint_program, hint_input_for)


def _vm():
    vm = VirtualMachine(Rv32Config(stark=TEST_STARK,
                                   executors=("alu", "loadstore",
                                              "hintstore"),
                                   bigint=True))
    vm.keygen()
    return vm


def _prove_debug_only(vm, exe, tamper_air=None, tamper_fn=None):
    import openvm_tpu.vm.machine as M
    air = None
    orig_trace = None
    if tamper_air:
        air = vm.airs[vm.air_index[tamper_air]]
        orig_trace = air.trace

        def tampered(rec, _orig=orig_trace):
            t = _orig(rec)
            return tamper_fn(t)
        air.trace = tampered
    orig = M.stark_prove
    M.stark_prove = lambda pk, ctxs: (_ for _ in ()).throw(SystemExit(0))
    try:
        vm.prove(exe, inputs=hint_input_for(A_VAL, B_VAL), debug=True,
                 native=False)
    except SystemExit:
        return  # debug checks passed
    finally:
        M.stark_prove = orig
        if air is not None:
            air.trace = orig_trace


def test_tampered_result_fails():
    """Flipping a result byte breaks the add/sub carry constraint."""
    vm = _vm()
    exe = build_bigint_program(ALL_OPS)

    def flip_z(t):
        c = vm.airs[vm.air_index["int256_alu"]].c
        t[0, c.index["z"]] ^= 1
        return t

    with pytest.raises(Exception, match="constraint|balance|bus"):
        _prove_debug_only(vm, exe, "int256_alu", flip_z)


def test_tampered_carry_fails():
    vm = _vm()
    exe = build_bigint_program(ALL_OPS)

    def flip_carry(t):
        c = vm.airs[vm.air_index["int256_mul"]].c
        t[0, c.index["carry"]] += 1
        return t

    with pytest.raises(Exception, match="constraint|balance|bus"):
        _prove_debug_only(vm, exe, "int256_mul", flip_carry)


def test_dropped_row_fails_bus_balance():
    """Marking a real row invalid breaks program/memory bus balance."""
    vm = _vm()
    exe = build_bigint_program(ALL_OPS)

    def drop_row(t):
        c = vm.airs[vm.air_index["int256_lt"]].c
        t[0, c.index["is_valid"]] = 0
        return t

    with pytest.raises(Exception, match="constraint|balance|bus"):
        _prove_debug_only(vm, exe, "int256_lt", drop_row)
