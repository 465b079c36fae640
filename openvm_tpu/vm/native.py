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


# ---------------------------------------------------------------------------
# Native preflight (E3)
# ---------------------------------------------------------------------------

_PF_SO = os.path.join(_CSRC, "libpreflight.so")
_PF_CPP = os.path.join(_CSRC, "preflight.cpp")
_pf_lib = None


class _PreflightOut(ctypes.Structure):
    _fields_ = [("error", ctypes.c_int64), ("exit_code", ctypes.c_int64),
                ("instret", ctypes.c_uint64), ("final_pc", ctypes.c_uint32),
                ("final_ts", ctypes.c_uint64), ("n_touched", ctypes.c_int64)]


# (chip name, width, field spec [(name, n_cols)...]) — must match
# csrc/preflight.cpp kWidths and row layouts exactly.
PREFLIGHT_LAYOUTS = [
    ("rv32_base_alu", 26, [("pc", 1), ("ts", 1), ("op_idx", 1),
                           ("is_imm", 1), ("a", 1), ("b", 1), ("c", 1),
                           ("rs1", 4), ("rs2", 4), ("rd", 4), ("p_ts1", 1),
                           ("p_ts2", 1), ("p_tsw", 1), ("prevw", 4)]),
    ("rv32_less_than", 22, [("pc", 1), ("ts", 1), ("op_idx", 1),
                            ("is_imm", 1), ("a", 1), ("b", 1), ("c", 1),
                            ("rs1", 4), ("rs2", 4), ("p_ts1", 1),
                            ("p_ts2", 1), ("p_tsw", 1), ("prevw", 4)]),
    ("rv32_shift", 26, [("pc", 1), ("ts", 1), ("op_idx", 1), ("is_imm", 1),
                        ("a", 1), ("b", 1), ("c", 1), ("rs1", 4),
                        ("rs2", 4), ("rd", 4), ("p_ts1", 1), ("p_ts2", 1),
                        ("p_tsw", 1), ("prevw", 4)]),
    ("rv32_mul", 25, [("pc", 1), ("ts", 1), ("op_idx", 1), ("a", 1),
                      ("b", 1), ("c", 1), ("rs1", 4), ("rs2", 4), ("rd", 4),
                      ("p_ts1", 1), ("p_ts2", 1), ("p_tsw", 1),
                      ("prevw", 4)]),
    ("rv32_div_rem", 29, [("pc", 1), ("ts", 1), ("op_idx", 1), ("a", 1),
                          ("b", 1), ("c", 1), ("rs1", 4), ("rs2", 4),
                          ("q", 4), ("r", 4), ("p_ts1", 1), ("p_ts2", 1),
                          ("p_tsw", 1), ("prevw", 4)]),
    ("rv32_branch_eq", 17, [("pc", 1), ("ts", 1), ("op_idx", 1), ("a", 1),
                            ("b", 1), ("imm", 1), ("rs1", 4), ("rs2", 4),
                            ("to_pc", 1), ("p_ts1", 1), ("p_ts2", 1)]),
    ("rv32_branch_lt", 17, [("pc", 1), ("ts", 1), ("op_idx", 1), ("a", 1),
                            ("b", 1), ("imm", 1), ("rs1", 4), ("rs2", 4),
                            ("to_pc", 1), ("p_ts1", 1), ("p_ts2", 1)]),
    ("rv32_jal_lui", 16, [("pc", 1), ("ts", 1), ("op_idx", 1), ("a", 1),
                          ("imm", 1), ("needs_write", 1), ("rd", 4),
                          ("to_pc", 1), ("p_tsw", 1), ("prevw", 4)]),
    ("rv32_jalr", 23, [("pc", 1), ("ts", 1), ("a", 1), ("b", 1), ("c", 1),
                       ("g", 1), ("needs_write", 1), ("rs1", 4), ("rd", 4),
                       ("to_pc", 1), ("lsb", 1), ("p_ts1", 1), ("p_tsw", 1),
                       ("prevw", 4)]),
    ("rv32_auipc", 13, [("pc", 1), ("ts", 1), ("a", 1), ("imm", 1),
                        ("rd", 4), ("p_tsw", 1), ("prevw", 4)]),
    ("rv32_load_store", 31, [("pc", 1), ("ts", 1), ("op_idx", 1), ("a", 1),
                             ("b", 1), ("c", 1), ("g", 1), ("e_as", 1),
                             ("needs_write", 1), ("rs1", 4),
                             ("word_addr", 1), ("s0", 1), ("s1", 1),
                             ("data2", 4), ("new3", 4), ("p_ts1", 1),
                             ("p_ts2", 1), ("p_tsw", 1), ("prevw", 4)]),
    ("rv32_hint_store", 28, [("pc", 1), ("ts0", 1), ("is_start", 1),
                             ("is_buffer", 1), ("a", 1), ("b", 1),
                             ("rem", 1), ("ptr", 1), ("ts_w", 1),
                             ("rs_ptr", 4), ("rs_len", 4), ("data", 4),
                             ("p_ts1", 1), ("p_ts2", 1), ("p_tsw", 1),
                             ("prevw", 4)]),
    ("phantom", 5, [("pc", 1), ("ts", 1), ("a", 1), ("b", 1), ("c", 1)]),
]


def load_preflight_library():
    global _pf_lib
    if _pf_lib is not None:
        return _pf_lib
    if (not os.path.exists(_PF_SO)
            or os.path.getmtime(_PF_SO) < os.path.getmtime(_PF_CPP)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _PF_CPP, "-o", _PF_SO],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_PF_SO)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.preflight.restype = _PreflightOut
    lib.preflight.argtypes = [
        i64p, i64p, i64p, i64p, i64p, i64p, i64p, i64p, ctypes.c_int64,
        ctypes.c_uint32, ctypes.c_uint32,
        i64p, i64p, ctypes.c_int64,
        u8p, i64p, ctypes.c_int64,
        ctypes.POINTER(i64p), i64p, i64p,
        i64p, i64p, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
    ]
    _pf_lib = lib
    return lib


def native_preflight(exe: VmExe, inputs=None, max_insns=None):
    """Run the C++ preflight; returns a PreflightResult (as preflight.py)."""
    from .preflight import PreflightResult
    from .interpreter import ExecutionError

    lib = load_preflight_library()
    input_items = [bytes(bytearray(x)) for x in (inputs or [])]

    insns = exe.program.instructions
    n = len(insns)
    ops = np.zeros((8, n), dtype=np.int64)
    for i, insn in enumerate(insns):
        if insn is None:
            ops[0, i] = -1
            continue
        ops[0, i] = insn.opcode
        ops[1:, i] = insn.operands()

    # image words (AS 2)
    img = {}
    for (a_s, addr), byte in exe.init_memory.items():
        if a_s == 2:
            w = img.setdefault(addr // 4, [0, 0, 0, 0])
            w[addr % 4] = byte
    image_words = np.asarray(sorted(img), dtype=np.int64)
    image_vals = np.asarray(
        [int.from_bytes(bytes(img[w]), "little") for w in sorted(img)],
        dtype=np.int64)

    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    counts = np.zeros(len(PREFLIGHT_LAYOUTS), dtype=np.int64)
    exec_counts = np.zeros(max(n, 1), dtype=np.int64)
    input_blob = np.frombuffer(b"".join(input_items) or b"\0",
                               dtype=np.uint8).copy()
    input_lens = np.asarray([len(x) for x in input_items] or [0],
                            dtype=np.int64)

    common_args = [
        *[ops[k].ctypes.data_as(i64p) for k in range(8)], n,
        exe.program.pc_base, exe.pc_start,
        image_words.ctypes.data_as(i64p), image_vals.ctypes.data_as(i64p),
        len(image_words),
        input_blob.ctypes.data_as(u8p), input_lens.ctypes.data_as(i64p),
        len(input_items),
    ]

    # pass 1: metered count-only run (the reference's E2 role) to size
    # record buffers exactly
    res = lib.preflight(*common_args, None, None,
                        counts.ctypes.data_as(i64p),
                        exec_counts.ctypes.data_as(i64p), None, 0,
                        max_insns or 0, 1)
    if res.error:
        raise ExecutionError(_ERRORS.get(res.error, f"error {res.error}"))
    n_touched = int(res.n_touched)

    # pass 2: full record generation into exact-size buffers
    bufs = []
    buf_ptrs = (i64p * len(PREFLIGHT_LAYOUTS))()
    caps = counts.copy()
    counts[:] = 0
    exec_counts[:] = 0
    for k, (_, width, _) in enumerate(PREFLIGHT_LAYOUTS):
        buf = np.zeros((max(int(caps[k]), 1), width), dtype=np.int64)
        bufs.append(buf)
        buf_ptrs[k] = buf.ctypes.data_as(i64p)
    touched_cap = n_touched + 8
    touched = np.zeros((touched_cap, 11), dtype=np.int64)

    res = lib.preflight(*common_args, buf_ptrs,
                        caps.ctypes.data_as(i64p),
                        counts.ctypes.data_as(i64p),
                        exec_counts.ctypes.data_as(i64p),
                        touched.ctypes.data_as(i64p), touched_cap,
                        max_insns or 0, 0)
    if res.error:
        raise ExecutionError(_ERRORS.get(res.error, f"error {res.error}"))

    records = {}
    for k, (name, width, fields) in enumerate(PREFLIGHT_LAYOUTS):
        cnt = int(counts[k])
        if cnt == 0:
            continue
        mat = bufs[k][:cnt].view(np.uint64)  # zero-copy (values nonneg)
        rec = {}
        col = 0
        for fname, ncols in fields:
            if ncols == 1:
                rec[fname] = mat[:, col]
            else:
                rec[fname] = mat[:, col:col + ncols]
            col += ncols
        records[name] = rec

    touched_d = {}
    init_words = {}
    for row in touched[:res.n_touched]:
        key = (int(row[0]), int(row[1]))
        init_words[key] = [int(x) for x in row[2:6]]
        touched_d[key] = [int(x) for x in row[6:10]] + [int(row[10])]

    pvs_out = [0] * 32
    for (a_s, wa), w in touched_d.items():
        if a_s == 3 and wa < 8:
            pvs_out[4 * wa:4 * wa + 4] = w[:4]

    return PreflightResult(
        records=records, touched=touched_d, init_words=init_words,
        exec_counts={i: int(c) for i, c in enumerate(exec_counts) if c},
        final_pc=int(res.final_pc), final_ts=int(res.final_ts),
        exit_code=int(res.exit_code), instret=int(res.instret),
        public_values=pvs_out)
