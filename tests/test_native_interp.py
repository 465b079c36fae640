"""Native (C++) E1 interpreter vs the Python oracle on real guest ELFs."""

import os

import pytest

from openvm_tpu.vm import Interpreter, load_elf, transpile_elf

GUESTS = "/root/reference/benchmarks/guest"


@pytest.mark.skipif(not os.path.isdir(GUESTS), reason="no reference guests")
def test_native_matches_python_on_fib_recursive():
    from openvm_tpu.vm.native import NativeInterpreter
    path = f"{GUESTS}/fibonacci_recursive/elf/openvm-fibonacci-recursive-program.elf"
    exe = transpile_elf(load_elf(open(path, "rb").read()))
    nat = NativeInterpreter(exe).execute()
    py = Interpreter(exe).execute()
    assert nat.error is None
    assert nat.exit_code == py.exit_code == 0
    assert nat.instret == py.instret
    assert bytes(nat.pvs[:4]) == bytes(
        py.public_values.get(i, 0) for i in range(4))


def test_native_hand_assembled(rng):
    from tests.test_vm_prove import build_fib_program, fib
    from openvm_tpu.vm.native import NativeInterpreter
    exe = build_fib_program(12)
    res = NativeInterpreter(exe).execute()
    assert res.error is None and res.exit_code == 0
    assert int.from_bytes(bytes(res.pvs[:4]), "little") == fib(13)
