"""ctypes bindings for the native (C++) E1 interpreter.

Builds csrc/interpreter.cpp with g++ on first use (cached as
csrc/libinterp_e1.so) and exposes `NativeInterpreter` with the same execute
surface as the Python `Interpreter`.  ~100x the Python loop's insn/s — the
reference keeps this layer native too (Rust, interpreter.rs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .instructions import VmExe

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libinterp_e1.so")
_CPP = os.path.join(_CSRC, "interpreter.cpp")


class _ExecResult(ctypes.Structure):
    _fields_ = [("exit_code", ctypes.c_int64),
                ("instret", ctypes.c_uint64),
                ("final_pc", ctypes.c_uint32),
                ("error", ctypes.c_int64)]


_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _CPP, "-o", _SO], check=True, capture_output=True)


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_CPP)):
        _build()
    lib = ctypes.CDLL(_SO)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.execute_e1.restype = _ExecResult
    lib.execute_e1.argtypes = [
        i64p, i64p, i64p, i64p, i64p, i64p, i64p, i64p, ctypes.c_int64,
        ctypes.c_uint32, ctypes.c_uint32, u8p, ctypes.c_uint64,
        u8p, i64p, ctypes.c_int64, u8p, ctypes.c_uint64, ctypes.c_uint64,
    ]
    _lib = lib
    return lib


_ERRORS = {1: "pc out of bounds", 2: "unsupported opcode",
           3: "hint stream underflow", 4: "EndOfInputStream",
           5: "instruction limit exceeded"}


class NativeResult:
    def __init__(self, res, memory, pvs):
        self.exit_code = int(res.exit_code) if res.error == 0 else None
        self.instret = int(res.instret)
        self.final_pc = int(res.final_pc)
        self.error = _ERRORS.get(res.error)
        self.memory = memory
        self.pvs = pvs

    @property
    def public_values(self):
        return {i: int(b) for i, b in enumerate(self.pvs)}


class NativeInterpreter:
    """Native E1 execution of a VmExe."""

    def __init__(self, exe: VmExe, mem_size: int = 1 << 28):
        self.exe = exe
        self.mem_size = mem_size
        self.lib = load_library()
        insns = exe.program.instructions
        n = len(insns)
        self.ops = np.zeros((8, n), dtype=np.int64)
        for i, insn in enumerate(insns):
            if insn is None:
                self.ops[0, i] = -1
                continue
            self.ops[0, i] = insn.opcode
            self.ops[1:, i] = insn.operands()
        for idx, entry in getattr(exe.program, "apc_by_pc_index",
                                  {}).items():
            insn = entry[0] if isinstance(entry, tuple) else entry
            self.ops[0, idx] = insn.opcode
            self.ops[1:, idx] = insn.operands()

    def execute(self, inputs=None, max_insns=None) -> NativeResult:
        memory = np.zeros(self.mem_size, dtype=np.uint8)
        for (addr_space, addr), byte in self.exe.init_memory.items():
            if addr_space == 2 and addr < self.mem_size:
                memory[addr] = byte
        pvs = np.zeros(32, dtype=np.uint8)
        items = [bytes(bytearray(x)) for x in (inputs or [])]
        input_blob = np.frombuffer(b"".join(items) or b"\0",
                                   dtype=np.uint8).copy()
        input_lens = np.asarray([len(x) for x in items] or [0],
                                dtype=np.int64)

        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        args = [self.ops[k].ctypes.data_as(i64p) for k in range(8)]
        res = self.lib.execute_e1(
            *args, self.ops.shape[1], self.exe.program.pc_base,
            self.exe.pc_start, memory.ctypes.data_as(u8p), self.mem_size,
            input_blob.ctypes.data_as(u8p),
            input_lens.ctypes.data_as(i64p), len(items),
            pvs.ctypes.data_as(u8p), 32, max_insns or 0)
        return NativeResult(res, memory, pvs)
