"""E1 pure interpreter: precomputed per-pc handlers over VmState.

Python re-design of the reference's ``InterpretedInstance`` hot loop
(reference crates/vm/src/arch/interpreter.rs:43-131): at construction every
program word is decoded once into a closure + packed immediate operands; the
run loop is a direct dispatch over handler index.  (The survey earmarks a C++
implementation of the same design for peak insn/s; this is the reference
semantics oracle and fallback.)

Semantics (register/memory model) mirror reference executors:
  * 32 registers as u32 (x0 hardwired 0 by transpilation-time f-flags)
  * byte-addressable guest memory (address space 2), little-endian words
  * address space 3 = user public values (REVEAL writes)
  * hint stream fed by phantom HintInput from the input stream
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .instructions import (BaseAlu256Opcode, BaseAluOpcode,
                           BranchEqual256Opcode, BranchEqualOpcode,
                           BranchLessThan256Opcode, BranchLessThanOpcode,
                           DivRemOpcode, LessThan256Opcode, LessThanOpcode,
                           Mul256Opcode, MulHOpcode, MulOpcode, P, Program,
                           PublishOpcode, Rv32AuipcOpcode,
                           Rv32HintStoreOpcode, Rv32JalLuiOpcode,
                           Rv32JalrOpcode, Rv32KeccakOpcode,
                           Rv32Sha256Opcode,
                           Rv32LoadStoreOpcode, Rv32Phantom, PairingPhantom,
                           ModularPhantom,
                           Shift256Opcode, ShiftOpcode, SysPhantom,
                           SystemOpcode, VmExe)

M32 = 0xFFFFFFFF


def _hint_final_exp(st, a, b, curve_idx):
    """HintFinalExp phantom executor (reference
    extensions/pairing/circuit/src/pairing_extension.rs:133-210)."""
    from ..pairing.final_exp import hint_final_exp_bytes

    def rd_bytes(ptr, ln):
        st.ensure_mem(ptr, ln)
        return bytes(st.memory[ptr:ptr + ln])

    try:
        hint = hint_final_exp_bytes(curve_idx, rd_bytes,
                                    st.regs[a // 4], st.regs[b // 4])
    except ValueError as ex:
        raise ExecutionError(str(ex)) from ex
    st.streams.hint_stream.clear()
    st.streams.hint_stream.extend(hint)


class ExecutionError(Exception):
    pass


@dataclass
class Streams:
    input_stream: list = field(default_factory=list)  # list of byte-lists
    hint_stream: list = field(default_factory=list)  # byte deque (list)
    kv_store: dict = field(default_factory=dict)


@dataclass
class VmState:
    pc: int = 0
    instret: int = 0
    regs: list = None  # 32 u32
    memory: bytearray = None  # address space 2
    public_values: dict = None  # byte index -> byte (address space 3)
    native: dict = None  # address space 4 (field elements)
    streams: Streams = None
    exit_code: int | None = None
    ct_stack: list = field(default_factory=list)  # cycle tracker spans

    @staticmethod
    def new(mem_size: int = 1 << 25) -> "VmState":
        return VmState(regs=[0] * 32, memory=bytearray(mem_size),
                       public_values={}, native={}, streams=Streams())

    def ensure_mem(self, addr: int, size: int) -> None:
        need = addr + size
        if need > len(self.memory):
            grow = max(need - len(self.memory), len(self.memory))
            self.memory.extend(bytes(grow))

    def read_u32(self, addr: int) -> int:
        self.ensure_mem(addr, 4)
        return int.from_bytes(self.memory[addr:addr + 4], "little")

    def write_u32(self, addr: int, val: int) -> None:
        self.ensure_mem(addr, 4)
        self.memory[addr:addr + 4] = (val & M32).to_bytes(4, "little")


def _sx(v: int, bits: int) -> int:
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _s32(v: int) -> int:
    return _sx(v & M32, 32)


def _imm24(c: int) -> int:
    """ALU immediate: u24 encoding of i12, sign-extended from bit 23."""
    return _sx(c & 0xFFFFFF, 24) & M32


def _imm16(c: int, g: int) -> int:
    """Load/store/jalr immediate: low 16 bits + sign flag g."""
    v = c & 0xFFFF
    if g:
        v |= 0xFFFF0000
    return v


class Interpreter:
    """Precomputed-handler interpreter for a fixed VmExe."""

    def __init__(self, exe: VmExe, moduli=(), curves=(), fp2=()):
        self.exe = exe
        self.moduli = tuple(moduli)
        self.curves = tuple(curves)
        self.fp2 = tuple(fp2)
        self.program = exe.program
        self.handlers = [self._compile(insn) if insn is not None else None
                         for insn in self.program.instructions]
        for idx, (insn, _dbg) in getattr(self.program, "apc_by_pc_index",
                                         {}).items():
            if 0 <= idx < len(self.handlers):
                self.handlers[idx] = self._compile(insn)

    # -- execution ------------------------------------------------------
    def create_initial_state(self, inputs=None) -> VmState:
        st = VmState.new()
        st.pc = self.exe.pc_start
        for (addr_space, addr), byte in self.exe.init_memory.items():
            if addr_space == 2:
                st.ensure_mem(addr, 1)
                st.memory[addr] = byte
            else:
                st.native[(addr_space, addr)] = byte
        if inputs:
            st.streams.input_stream = [list(x) for x in inputs]
        return st

    def execute(self, inputs=None, max_insns: int | None = None) -> VmState:
        st = self.create_initial_state(inputs)
        handlers = self.handlers
        pc_base = self.program.pc_base
        step = self.program.step
        while st.exit_code is None:
            idx = (st.pc - pc_base) // step
            if idx < 0 or idx >= len(handlers) or handlers[idx] is None:
                raise ExecutionError(f"pc out of bounds: {st.pc:#x}")
            handlers[idx](st)
            st.instret += 1
            if max_insns is not None and st.instret >= max_insns:
                raise ExecutionError("instruction limit exceeded")
        return st

    # -- handler compilation -------------------------------------------
    def _compile(self, insn):
        op = insn.opcode
        a, b, c, d, e, f, g = insn.operands()
        ra, rb, rc = a // 4, b // 4, c // 4

        def adv(st, val_reg=None, val=None):
            st.pc = (st.pc + 4) & M32

        # ---- ALU ----
        if op in (BaseAluOpcode.ADD, BaseAluOpcode.SUB, BaseAluOpcode.XOR,
                  BaseAluOpcode.OR, BaseAluOpcode.AND):
            use_imm = (e == 0)
            imm = _imm24(c)

            def h(st, op=op, ra=ra, rb=rb, rc=rc, use_imm=use_imm, imm=imm):
                r = st.regs
                x = r[rb]
                y = imm if use_imm else r[rc]
                if op == BaseAluOpcode.ADD:
                    v = (x + y) & M32
                elif op == BaseAluOpcode.SUB:
                    v = (x - y) & M32
                elif op == BaseAluOpcode.XOR:
                    v = x ^ y
                elif op == BaseAluOpcode.OR:
                    v = x | y
                else:
                    v = x & y
                if ra:
                    r[ra] = v
                st.pc = (st.pc + 4) & M32
            return h

        if op in (ShiftOpcode.SLL, ShiftOpcode.SRL, ShiftOpcode.SRA):
            use_imm = (e == 0)
            imm = c & 31

            def h(st, op=op, ra=ra, rb=rb, rc=rc, use_imm=use_imm, imm=imm):
                r = st.regs
                x = r[rb]
                sh = imm if use_imm else (r[rc] & 31)
                if op == ShiftOpcode.SLL:
                    v = (x << sh) & M32
                elif op == ShiftOpcode.SRL:
                    v = x >> sh
                else:
                    v = (_s32(x) >> sh) & M32
                if ra:
                    r[ra] = v
                st.pc = (st.pc + 4) & M32
            return h

        if op in (LessThanOpcode.SLT, LessThanOpcode.SLTU):
            use_imm = (e == 0)
            imm = _imm24(c)

            def h(st, op=op, ra=ra, rb=rb, rc=rc, use_imm=use_imm, imm=imm):
                r = st.regs
                x = r[rb]
                y = imm if use_imm else r[rc]
                if op == LessThanOpcode.SLT:
                    v = int(_s32(x) < _s32(y))
                else:
                    v = int(x < y)
                if ra:
                    r[ra] = v
                st.pc = (st.pc + 4) & M32
            return h

        # ---- loads/stores ----
        if op in (Rv32LoadStoreOpcode.LOADW, Rv32LoadStoreOpcode.LOADBU,
                  Rv32LoadStoreOpcode.LOADHU, Rv32LoadStoreOpcode.LOADB,
                  Rv32LoadStoreOpcode.LOADH):
            imm = _imm16(c, g)

            def h(st, op=op, ra=ra, rb=rb, imm=imm, write_rd=f):
                r = st.regs
                addr = (r[rb] + imm) & M32
                if op == Rv32LoadStoreOpcode.LOADW:
                    v = st.read_u32(addr)
                elif op == Rv32LoadStoreOpcode.LOADBU:
                    st.ensure_mem(addr, 1)
                    v = st.memory[addr]
                elif op == Rv32LoadStoreOpcode.LOADHU:
                    st.ensure_mem(addr, 2)
                    v = int.from_bytes(st.memory[addr:addr + 2], "little")
                elif op == Rv32LoadStoreOpcode.LOADB:
                    st.ensure_mem(addr, 1)
                    v = _sx(st.memory[addr], 8) & M32
                else:
                    st.ensure_mem(addr, 2)
                    v = _sx(int.from_bytes(st.memory[addr:addr + 2],
                                           "little"), 16) & M32
                if write_rd and ra:
                    r[ra] = v
                st.pc = (st.pc + 4) & M32
            return h

        if op in (Rv32LoadStoreOpcode.STOREW, Rv32LoadStoreOpcode.STOREH,
                  Rv32LoadStoreOpcode.STOREB):
            imm = _imm16(c, g)
            addr_space = e

            def h(st, op=op, ra=ra, rb=rb, imm=imm, addr_space=addr_space):
                r = st.regs
                addr = (r[rb] + imm) & M32
                val = r[ra]
                if addr_space == 2:
                    if op == Rv32LoadStoreOpcode.STOREW:
                        st.write_u32(addr, val)
                    elif op == Rv32LoadStoreOpcode.STOREH:
                        st.ensure_mem(addr, 2)
                        st.memory[addr:addr + 2] = (val & 0xFFFF).to_bytes(
                            2, "little")
                    else:
                        st.ensure_mem(addr, 1)
                        st.memory[addr] = val & 0xFF
                elif addr_space == 3:
                    for i, byte in enumerate((val & M32).to_bytes(
                            4, "little")):
                        st.public_values[addr + i] = byte
                else:  # native store
                    st.native[(addr_space, addr)] = val
                st.pc = (st.pc + 4) & M32
            return h

        # ---- branches ----
        if op in (BranchEqualOpcode.BEQ, BranchEqualOpcode.BNE,
                  BranchLessThanOpcode.BLT, BranchLessThanOpcode.BLTU,
                  BranchLessThanOpcode.BGE, BranchLessThanOpcode.BGEU):
            off = c if c <= P // 2 else c - P

            def h(st, op=op, ra=ra, rb=rb, off=off):
                r = st.regs
                x, y = r[ra], r[rb]
                if op == BranchEqualOpcode.BEQ:
                    t = x == y
                elif op == BranchEqualOpcode.BNE:
                    t = x != y
                elif op == BranchLessThanOpcode.BLT:
                    t = _s32(x) < _s32(y)
                elif op == BranchLessThanOpcode.BLTU:
                    t = x < y
                elif op == BranchLessThanOpcode.BGE:
                    t = _s32(x) >= _s32(y)
                else:
                    t = x >= y
                st.pc = (st.pc + (off if t else 4)) & M32
            return h

        # ---- jumps / upper immediates ----
        if op == Rv32JalLuiOpcode.JAL:
            off = c if c <= P // 2 else c - P

            def h(st, ra=ra, off=off, write_rd=f):
                if write_rd and ra:
                    st.regs[ra] = (st.pc + 4) & M32
                st.pc = (st.pc + off) & M32
            return h

        if op == Rv32JalLuiOpcode.LUI:
            val = (c << 12) & M32

            def h(st, ra=ra, val=val):
                if ra:
                    st.regs[ra] = val
                st.pc = (st.pc + 4) & M32
            return h

        if op == Rv32JalrOpcode.JALR:
            imm = _imm16(c, g)

            def h(st, ra=ra, rb=rb, imm=imm, write_rd=f):
                target = (st.regs[rb] + imm) & M32 & ~1
                if write_rd and ra:
                    st.regs[ra] = (st.pc + 4) & M32
                st.pc = target
            return h

        if op == Rv32AuipcOpcode.AUIPC:
            val = (c << 8) & M32

            def h(st, ra=ra, val=val):
                if ra:
                    st.regs[ra] = (st.pc + val) & M32
                st.pc = (st.pc + 4) & M32
            return h

        # ---- M extension ----
        if op == MulOpcode.MUL:
            def h(st, ra=ra, rb=rb, rc=rc):
                if ra:
                    st.regs[ra] = (st.regs[rb] * st.regs[rc]) & M32
                st.pc = (st.pc + 4) & M32
            return h

        if op in (MulHOpcode.MULH, MulHOpcode.MULHSU, MulHOpcode.MULHU):
            def h(st, op=op, ra=ra, rb=rb, rc=rc):
                x, y = st.regs[rb], st.regs[rc]
                if op == MulHOpcode.MULH:
                    v = (_s32(x) * _s32(y)) >> 32
                elif op == MulHOpcode.MULHSU:
                    v = (_s32(x) * y) >> 32
                else:
                    v = (x * y) >> 32
                if ra:
                    st.regs[ra] = v & M32
                st.pc = (st.pc + 4) & M32
            return h

        if op in (DivRemOpcode.DIV, DivRemOpcode.DIVU, DivRemOpcode.REM,
                  DivRemOpcode.REMU):
            def h(st, op=op, ra=ra, rb=rb, rc=rc):
                x, y = st.regs[rb], st.regs[rc]
                if op == DivRemOpcode.DIV:
                    if y == 0:
                        v = M32
                    else:
                        sx_, sy = _s32(x), _s32(y)
                        if sx_ == -(1 << 31) and sy == -1:
                            v = 1 << 31
                        else:
                            q = abs(sx_) // abs(sy)
                            v = (q if (sx_ < 0) == (sy < 0) else -q) & M32
                elif op == DivRemOpcode.DIVU:
                    v = M32 if y == 0 else x // y
                elif op == DivRemOpcode.REM:
                    if y == 0:
                        v = x
                    else:
                        sx_, sy = _s32(x), _s32(y)
                        if sx_ == -(1 << 31) and sy == -1:
                            v = 0
                        else:
                            rmd = abs(sx_) % abs(sy)
                            v = (rmd if sx_ >= 0 else -rmd) & M32
                else:
                    v = x if y == 0 else x % y
                if ra:
                    st.regs[ra] = v
                st.pc = (st.pc + 4) & M32
            return h

        # ---- Int256 (bigint) extension ----
        if ((BaseAlu256Opcode.ADD <= op <= LessThan256Opcode.SLTU)
                or op == Mul256Opcode.MUL):
            M256 = (1 << 256) - 1

            def h(st, op=op, ra=ra, rb=rb, rc=rc):
                p1, p2, pd = st.regs[rb], st.regs[rc], st.regs[ra]
                for p_ in (p1, p2, pd):
                    if p_ % 4 != 0 or p_ >= (1 << 29):
                        raise ExecutionError(
                            f"bad int256 pointer {p_:#x} at pc {st.pc:#x}")
                st.ensure_mem(max(p1, p2) + 32, 32)
                x = int.from_bytes(st.memory[p1:p1 + 32], "little")
                y = int.from_bytes(st.memory[p2:p2 + 32], "little")
                if op == BaseAlu256Opcode.ADD:
                    z = (x + y) & M256
                elif op == BaseAlu256Opcode.SUB:
                    z = (x - y) & M256
                elif op == BaseAlu256Opcode.XOR:
                    z = x ^ y
                elif op == BaseAlu256Opcode.OR:
                    z = x | y
                elif op == BaseAlu256Opcode.AND:
                    z = x & y
                elif op == Shift256Opcode.SLL:
                    z = (x << (y & 255)) & M256
                elif op == Shift256Opcode.SRL:
                    z = x >> (y & 255)
                elif op == Shift256Opcode.SRA:
                    sx_ = x - (1 << 256) if x >> 255 else x
                    z = (sx_ >> (y & 255)) & M256
                elif op == LessThan256Opcode.SLT:
                    sx_ = x - (1 << 256) if x >> 255 else x
                    sy_ = y - (1 << 256) if y >> 255 else y
                    z = int(sx_ < sy_)
                elif op == LessThan256Opcode.SLTU:
                    z = int(x < y)
                else:  # MUL256
                    z = (x * y) & M256
                st.ensure_mem(pd, 32)
                st.memory[pd:pd + 32] = z.to_bytes(32, "little")
                st.pc = (st.pc + 4) & M32
            return h

        if BranchEqual256Opcode.BEQ <= op <= BranchLessThan256Opcode.BGEU:
            off = c if c <= P // 2 else c - P

            def h(st, op=op, ra=ra, rb=rb, off=off):
                p1, p2 = st.regs[ra], st.regs[rb]
                for p_ in (p1, p2):
                    if p_ % 4 != 0 or p_ >= (1 << 29):
                        raise ExecutionError(
                            f"bad int256 pointer {p_:#x} at pc {st.pc:#x}")
                st.ensure_mem(max(p1, p2) + 32, 32)
                x = int.from_bytes(st.memory[p1:p1 + 32], "little")
                y = int.from_bytes(st.memory[p2:p2 + 32], "little")
                if op == BranchEqual256Opcode.BEQ:
                    taken = x == y
                elif op == BranchEqual256Opcode.BNE:
                    taken = x != y
                else:
                    if op in (BranchLessThan256Opcode.BLT,
                              BranchLessThan256Opcode.BGE):
                        x = x - (1 << 256) if x >> 255 else x
                        y = y - (1 << 256) if y >> 255 else y
                    lt = x < y
                    taken = lt if op in (BranchLessThan256Opcode.BLT,
                                         BranchLessThan256Opcode.BLTU
                                         ) else not lt
                st.pc = (st.pc + off) & M32 if taken else (st.pc + 4) & M32
            return h

        # ---- keccak256 extension ----
        if op == Rv32KeccakOpcode.KECCAK256:
            def h(st, ra=ra, rb=rb, rc=rc):
                from .circuit.keccak import keccak256
                dst, src, ln = st.regs[ra], st.regs[rb], st.regs[rc]
                # src and dst may both be byte-aligned (word windows)
                if src + ln >= (1 << 29) or dst + 32 >= (1 << 29):
                    raise ExecutionError("keccak256 range out of bounds")
                st.ensure_mem(src + ln, 1)
                digest = keccak256(bytes(st.memory[src:src + ln]))
                st.ensure_mem(dst, 32)
                st.memory[dst:dst + 32] = digest
                st.pc = (st.pc + 4) & M32
            return h

        # ---- sha256 extension ----
        if op == Rv32Sha256Opcode.SHA256:
            def h(st, ra=ra, rb=rb, rc=rc):
                from .circuit.sha256 import sha256
                dst, src, ln = st.regs[ra], st.regs[rb], st.regs[rc]
                # src and dst may both be byte-aligned (word windows)
                if src + ln >= (1 << 29) or dst + 32 >= (1 << 29):
                    raise ExecutionError("sha256 range out of bounds")
                st.ensure_mem(src + ln, 1)
                digest = sha256(bytes(st.memory[src:src + ln]))
                st.ensure_mem(dst, 32)
                st.memory[dst:dst + 32] = digest
                st.pc = (st.pc + 4) & M32
            return h

        # ---- modular arithmetic (algebra) extension ----
        if 0x500 <= op < 0x540 and self.moduli:
            mod_idx = (op - 0x500) // 8
            base = (op - 0x500) % 8
            if mod_idx < len(self.moduli) and base in (0, 1, 3, 4, 6):
                Nmod = self.moduli[mod_idx]

                def h(st, base=base, Nmod=Nmod, ra=ra, rb=rb, rc=rc):
                    p1, p2 = st.regs[rb], st.regs[rc]
                    for p_ in (p1, p2):
                        if p_ % 4 != 0 or p_ >= (1 << 29):
                            raise ExecutionError(
                                f"bad modular pointer {p_:#x}")
                    st.ensure_mem(max(p1, p2) + 32, 32)
                    x = int.from_bytes(st.memory[p1:p1 + 32], "little")
                    y = int.from_bytes(st.memory[p2:p2 + 32], "little")
                    if base == 6:  # IS_EQ -> u32 register write
                        if x >= Nmod or y >= Nmod:
                            raise ExecutionError("is_eq input not reduced")
                        if ra:
                            st.regs[ra] = int(x == y)
                        st.pc = (st.pc + 4) & M32
                        return
                    if base == 0:
                        z = (x + y) % Nmod
                    elif base == 1:
                        z = (x - y) % Nmod
                    elif base == 3:
                        z = (x * y) % Nmod
                    else:
                        if y % Nmod == 0:
                            raise ExecutionError("modular division by zero")
                        z = (x * pow(y, -1, Nmod)) % Nmod
                    pd = st.regs[ra]
                    if pd % 4 != 0 or pd >= (1 << 29):
                        raise ExecutionError(f"bad modular pointer {pd:#x}")
                    st.ensure_mem(pd, 32)
                    st.memory[pd:pd + 32] = z.to_bytes(32, "little")
                    st.pc = (st.pc + 4) & M32
                return h

        # ---- ECC (short Weierstrass) extension ----
        if 0x600 <= op < 0x600 + 4 * len(self.curves):
            curve_idx = (op - 0x600) // 4
            base = (op - 0x600) % 4
            pmod, acoef = self.curves[curve_idx]
            if base in (0, 2):
                def h(st, base=base, pmod=pmod, acoef=acoef, ra=ra, rb=rb,
                      rc=rc):
                    p1 = st.regs[rb]
                    pd = st.regs[ra]
                    ptrs = [p1, pd] + ([st.regs[rc]] if base == 0 else [])
                    for p_ in ptrs:
                        if p_ % 4 != 0 or p_ >= (1 << 29):
                            raise ExecutionError(f"bad ec pointer {p_:#x}")
                    st.ensure_mem(p1, 64)
                    x1 = int.from_bytes(st.memory[p1:p1 + 32], "little")
                    y1 = int.from_bytes(st.memory[p1 + 32:p1 + 64],
                                        "little")
                    if base == 0:  # EC_ADD_NE
                        p2 = st.regs[rc]
                        st.ensure_mem(p2, 64)
                        x2 = int.from_bytes(st.memory[p2:p2 + 32], "little")
                        y2 = int.from_bytes(st.memory[p2 + 32:p2 + 64],
                                            "little")
                        if (x1 - x2) % pmod == 0:
                            raise ExecutionError("EC_ADD_NE with equal x")
                        lam = ((y2 - y1)
                               * pow((x2 - x1) % pmod, -1, pmod)) % pmod
                        x3 = (lam * lam - x1 - x2) % pmod
                    else:  # EC_DOUBLE
                        if y1 % pmod == 0:
                            raise ExecutionError(
                                "EC_DOUBLE of 2-torsion point")
                        lam = ((3 * x1 * x1 + acoef)
                               * pow((2 * y1) % pmod, -1, pmod)) % pmod
                        x3 = (lam * lam - 2 * x1) % pmod
                    y3 = (lam * (x1 - x3) - y1) % pmod
                    st.ensure_mem(pd, 64)
                    st.memory[pd:pd + 32] = x3.to_bytes(32, "little")
                    st.memory[pd + 32:pd + 64] = y3.to_bytes(32, "little")
                    st.pc = (st.pc + 4) & M32
                return h

        # ---- Fp2 (complex extension field) ----
        if 0x710 <= op < 0x710 + 6 * len(self.fp2):
            fp2_idx = (op - 0x710) // 6
            base = (op - 0x710) % 6
            pmod = self.fp2[fp2_idx]
            if base in (0, 1, 3, 4):
                def h(st, base=base, pmod=pmod, ra=ra, rb=rb, rc=rc):
                    from .circuit.fp2 import fp2_div, fp2_mul
                    p1, p2, pd = st.regs[rb], st.regs[rc], st.regs[ra]
                    for p_ in (p1, p2, pd):
                        if p_ % 4 != 0 or p_ >= (1 << 29):
                            raise ExecutionError(f"bad fp2 pointer {p_:#x}")
                    st.ensure_mem(max(p1, p2) + 64, 64)
                    a0 = int.from_bytes(st.memory[p1:p1 + 32],
                                        "little") % pmod
                    a1 = int.from_bytes(st.memory[p1 + 32:p1 + 64],
                                        "little") % pmod
                    b0 = int.from_bytes(st.memory[p2:p2 + 32],
                                        "little") % pmod
                    b1 = int.from_bytes(st.memory[p2 + 32:p2 + 64],
                                        "little") % pmod
                    if base == 0:
                        z0, z1 = (a0 + b0) % pmod, (a1 + b1) % pmod
                    elif base == 1:
                        z0, z1 = (a0 - b0) % pmod, (a1 - b1) % pmod
                    elif base == 3:
                        z0, z1 = fp2_mul(pmod, a0, a1, b0, b1)
                    else:
                        try:
                            z0, z1 = fp2_div(pmod, a0, a1, b0, b1)
                        except ZeroDivisionError:
                            raise ExecutionError("fp2 division by zero")
                    st.ensure_mem(pd, 64)
                    st.memory[pd:pd + 32] = z0.to_bytes(32, "little")
                    st.memory[pd + 32:pd + 64] = z1.to_bytes(32, "little")
                    st.pc = (st.pc + 4) & M32
                return h

        # ---- hints ----
        if op in (Rv32HintStoreOpcode.HINT_STOREW,
                  Rv32HintStoreOpcode.HINT_BUFFER):
            is_storew = (op == Rv32HintStoreOpcode.HINT_STOREW)

            def h(st, ra=ra, rb=rb, is_storew=is_storew):
                mem_ptr = st.regs[rb]
                num_words = 1 if is_storew else st.regs[ra]
                hs = st.streams.hint_stream
                if len(hs) < 4 * num_words:
                    raise ExecutionError("hint stream underflow")
                data = bytes(hs[:4 * num_words])
                del hs[:4 * num_words]
                st.ensure_mem(mem_ptr, 4 * num_words)
                st.memory[mem_ptr:mem_ptr + 4 * num_words] = data
                st.pc = (st.pc + 4) & M32
            return h

        # ---- system ----
        if op == SystemOpcode.TERMINATE:
            def h(st, code=c):
                st.exit_code = code
            return h

        if op == SystemOpcode.PHANTOM:
            disc = c & 0xFFFF
            c_upper = c >> 16

            def h(st, disc=disc, a=a, b=b, c_upper=c_upper):
                if disc == Rv32Phantom.HINT_INPUT:
                    if not st.streams.input_stream:
                        raise ExecutionError("EndOfInputStream")
                    hint = list(st.streams.input_stream.pop(0))
                    st.streams.hint_stream.clear()
                    st.streams.hint_stream.extend(
                        len(hint).to_bytes(4, "little"))
                    pad = (-len(hint)) % 4
                    st.streams.hint_stream.extend(hint + [0] * pad)
                elif disc == Rv32Phantom.PRINT_STR:
                    ptr = st.regs[a // 4]
                    length = st.regs[b // 4]
                    st.ensure_mem(ptr, length)
                    import sys
                    sys.stdout.write(
                        st.memory[ptr:ptr + length].decode(errors="replace"))
                elif disc == Rv32Phantom.HINT_RANDOM:
                    import random
                    length = st.regs[a // 4]
                    st.streams.hint_stream.clear()
                    st.streams.hint_stream.extend(
                        random.randrange(256) for _ in range(4 * length))
                elif disc == PairingPhantom.HINT_FINAL_EXP:
                    _hint_final_exp(st, a, b, c_upper)
                elif disc == ModularPhantom.HINT_NON_QR:
                    from .modhints import non_qr_hint_bytes
                    if c_upper >= len(self.moduli):
                        raise ExecutionError(
                            f"hint_non_qr modulus index {c_upper} out of "
                            f"range ({len(self.moduli)} moduli)")
                    st.streams.hint_stream.clear()
                    st.streams.hint_stream.extend(
                        non_qr_hint_bytes(self.moduli[c_upper]))
                elif disc == ModularPhantom.HINT_SQRT:
                    from .modhints import num_limbs, sqrt_hint_bytes
                    if c_upper >= len(self.moduli):
                        raise ExecutionError(
                            f"hint_sqrt modulus index {c_upper} out of "
                            f"range ({len(self.moduli)} moduli)")
                    mod = self.moduli[c_upper]
                    ptr = st.regs[a // 4]
                    nl = num_limbs(mod)
                    st.ensure_mem(ptr, nl)
                    xv = int.from_bytes(st.memory[ptr:ptr + nl], "little")
                    st.streams.hint_stream.clear()
                    st.streams.hint_stream.extend(sqrt_hint_bytes(xv, mod))
                elif disc == Rv32Phantom.HINT_LOAD_BY_KEY:
                    ptr = st.regs[a // 4]
                    length = st.regs[b // 4]
                    key = bytes(st.memory[ptr:ptr + length])
                    if key not in st.streams.kv_store:
                        raise ExecutionError(f"hint key not found: {key!r}")
                    for inp in reversed(st.streams.kv_store[key]):
                        st.streams.input_stream.insert(0, list(inp))
                elif disc == SysPhantom.CT_START:
                    # cycle tracker span start (reference
                    # metrics/cycle_tracker/mod.rs; names are span ids —
                    # operand c picks the label when the guest provides
                    # one, else the pc identifies the span)
                    # +1: the span covers instructions BETWEEN the two
                    # markers, not the CT_START phantom itself
                    st.ct_stack.append((c_upper or st.pc, st.instret + 1))
                elif disc == SysPhantom.CT_END:
                    if st.ct_stack:
                        name, start = st.ct_stack.pop()
                        from .. import metrics
                        metrics.counter(
                            "cycles", st.instret - start,
                            cycle_tracker_span=f"ct_{name:#x}"
                            if isinstance(name, int) else str(name))
                # SysPhantom NOP falls through
                st.pc = (st.pc + 4) & M32
            return h

        if op == PublishOpcode.PUBLISH:
            def h(st, a=a, b=b):
                raise ExecutionError("PUBLISH unsupported in rv32 E1")
            return h

        def h(st, op=op):
            raise ExecutionError(f"unsupported opcode {op:#x}")
        return h
