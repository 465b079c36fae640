"""RV32IM + intrinsics assembler producing `VmExe` executables.

Guest-authoring layer (reference role: crates/toolchain/openvm guest stdlib
+ custom_insn_r!/i! macros + guest-lib intrinsic wrappers, SURVEY.md §2.18).
Emits raw RISC-V words — including every custom-0/custom-1 intrinsic
encoding the reference guest libs emit — and runs them through this
framework's transpiler, so an assembled guest is bit-for-bit the same
`VmExe` a compiled guest with those instructions would produce.

Typical use::

    from openvm_tpu.guest import Assembler, x

    a = Assembler()
    a.li(x[1], 0); a.li(x[2], 1); a.li(x[3], 10)
    loop = a.label_here()
    a.add(x[4], x[1], x[2]); a.mv(x[1], x[2]); a.mv(x[2], x[4])
    a.addi(x[3], x[3], -1)
    a.bne(x[3], x[0], loop)
    a.reveal(x[2], 0)
    a.terminate()
    exe = a.build()
"""

from __future__ import annotations

from dataclasses import dataclass, field


class _Regs:
    """x[0]..x[31] register indices (plain ints)."""

    def __getitem__(self, i: int) -> int:
        if not 0 <= i < 32:
            raise ValueError(f"no register x{i}")
        return i


x = _Regs()


@dataclass
class Label:
    name: str = ""
    pc: int | None = None
    fixups: list = field(default_factory=list)  # (word_index, kind)


def _enc_r(op, f3, f7, rd, rs1, rs2):
    return (f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) \
        | (rd << 7) | op


def _enc_i(op, f3, rd, rs1, imm):
    return ((imm & 0xFFF) << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | op


def _enc_s(op, f3, rs1, rs2, imm):
    imm &= 0xFFF
    return ((imm >> 5) << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) \
        | ((imm & 0x1F) << 7) | op


def _enc_b(f3, rs1, rs2, imm):
    imm &= 0x1FFF
    return (((imm >> 12) & 1) << 31) | (((imm >> 5) & 0x3F) << 25) \
        | (rs2 << 20) | (rs1 << 15) | (f3 << 12) | (((imm >> 1) & 0xF) << 8) \
        | (((imm >> 11) & 1) << 7) | 0b1100011


def _enc_j(rd, imm):
    imm &= 0x1FFFFF
    return (((imm >> 20) & 1) << 31) | (((imm >> 1) & 0x3FF) << 21) \
        | (((imm >> 11) & 1) << 20) | (((imm >> 12) & 0xFF) << 12) \
        | (rd << 7) | 0b1101111


def _enc_u(op, rd, imm20):
    return ((imm20 & 0xFFFFF) << 12) | (rd << 7) | op


OP_CUSTOM0 = 0x0B
OP_CUSTOM1 = 0x2B


class Assembler:
    """Two-pass assembler: emit words + label fixups, then transpile."""

    def __init__(self, pc_base: int = 0, data_base: int = 0x1000):
        self.words: list[int] = []
        self.pc_base = pc_base
        self.init_memory: dict = {}
        self._data_ptr = data_base
        self._labels: list[Label] = []

    # -- labels -----------------------------------------------------------

    def label(self, name: str = "") -> Label:
        lbl = Label(name)
        self._labels.append(lbl)
        return lbl

    def place(self, lbl: Label):
        lbl.pc = self.pc_base + 4 * len(self.words)
        for idx, kind in lbl.fixups:
            self.words[idx] = self._patch(self.words[idx], idx, lbl.pc, kind)
        lbl.fixups.clear()

    def label_here(self, name: str = "") -> Label:
        lbl = self.label(name)
        self.place(lbl)
        return lbl

    def _offset(self, lbl: Label, kind: str) -> int:
        if lbl.pc is None:
            lbl.fixups.append((len(self.words), kind))
            return 0
        return lbl.pc - (self.pc_base + 4 * len(self.words))

    def _patch(self, word: int, idx: int, target_pc: int, kind: str) -> int:
        off = target_pc - (self.pc_base + 4 * idx)
        if kind == "b":
            f3 = (word >> 12) & 7
            rs1 = (word >> 15) & 31
            rs2 = (word >> 20) & 31
            return _enc_b(f3, rs1, rs2, off)
        if kind == "j":
            rd = (word >> 7) & 31
            return _enc_j(rd, off)
        if kind == "b256":
            rs1 = (word >> 15) & 31
            rs2 = (word >> 20) & 31
            f3 = (word >> 12) & 7
            b = _enc_b(f3, rs1, rs2, off)
            return (b & ~0x7F) | OP_CUSTOM0
        raise ValueError(kind)

    # -- data section -------------------------------------------------------

    def data(self, payload: bytes, align: int = 4, addr_space: int = 2) -> int:
        """Place bytes in the init-memory image; returns their address."""
        self._data_ptr = (self._data_ptr + align - 1) // align * align
        addr = self._data_ptr
        for i, b in enumerate(payload):
            self.init_memory[(addr_space, addr + i)] = b
        self._data_ptr += len(payload)
        return addr

    def word(self, raw: int):
        """Emit a raw instruction word."""
        self.words.append(raw & 0xFFFFFFFF)

    # -- RV32I ---------------------------------------------------------------

    def _r(self, f3, f7, rd, rs1, rs2):
        self.word(_enc_r(0b0110011, f3, f7, rd, rs1, rs2))

    def add(self, rd, rs1, rs2): self._r(0, 0x00, rd, rs1, rs2)
    def sub(self, rd, rs1, rs2): self._r(0, 0x20, rd, rs1, rs2)
    def xor(self, rd, rs1, rs2): self._r(4, 0x00, rd, rs1, rs2)
    def or_(self, rd, rs1, rs2): self._r(6, 0x00, rd, rs1, rs2)
    def and_(self, rd, rs1, rs2): self._r(7, 0x00, rd, rs1, rs2)
    def sll(self, rd, rs1, rs2): self._r(1, 0x00, rd, rs1, rs2)
    def srl(self, rd, rs1, rs2): self._r(5, 0x00, rd, rs1, rs2)
    def sra(self, rd, rs1, rs2): self._r(5, 0x20, rd, rs1, rs2)
    def slt(self, rd, rs1, rs2): self._r(2, 0x00, rd, rs1, rs2)
    def sltu(self, rd, rs1, rs2): self._r(3, 0x00, rd, rs1, rs2)

    def addi(self, rd, rs1, imm): self.word(_enc_i(0b0010011, 0, rd, rs1, imm))
    def xori(self, rd, rs1, imm): self.word(_enc_i(0b0010011, 4, rd, rs1, imm))
    def ori(self, rd, rs1, imm): self.word(_enc_i(0b0010011, 6, rd, rs1, imm))
    def andi(self, rd, rs1, imm): self.word(_enc_i(0b0010011, 7, rd, rs1, imm))
    def slti(self, rd, rs1, imm): self.word(_enc_i(0b0010011, 2, rd, rs1, imm))
    def sltiu(self, rd, rs1, imm):
        self.word(_enc_i(0b0010011, 3, rd, rs1, imm))

    def slli(self, rd, rs1, sh): self.word(_enc_i(0b0010011, 1, rd, rs1, sh))
    def srli(self, rd, rs1, sh): self.word(_enc_i(0b0010011, 5, rd, rs1, sh))
    def srai(self, rd, rs1, sh):
        self.word(_enc_i(0b0010011, 5, rd, rs1, sh | 0x400))

    def lb(self, rd, rs1, imm): self.word(_enc_i(0b0000011, 0, rd, rs1, imm))
    def lh(self, rd, rs1, imm): self.word(_enc_i(0b0000011, 1, rd, rs1, imm))
    def lw(self, rd, rs1, imm): self.word(_enc_i(0b0000011, 2, rd, rs1, imm))
    def lbu(self, rd, rs1, imm): self.word(_enc_i(0b0000011, 4, rd, rs1, imm))
    def lhu(self, rd, rs1, imm): self.word(_enc_i(0b0000011, 5, rd, rs1, imm))

    def sb(self, rs2, rs1, imm): self.word(_enc_s(0b0100011, 0, rs1, rs2, imm))
    def sh(self, rs2, rs1, imm): self.word(_enc_s(0b0100011, 1, rs1, rs2, imm))
    def sw(self, rs2, rs1, imm): self.word(_enc_s(0b0100011, 2, rs1, rs2, imm))

    def _b(self, f3, rs1, rs2, target: Label | int):
        off = target if isinstance(target, int) \
            else self._offset(target, "b")
        self.word(_enc_b(f3, rs1, rs2, off))

    def beq(self, rs1, rs2, t): self._b(0, rs1, rs2, t)
    def bne(self, rs1, rs2, t): self._b(1, rs1, rs2, t)
    def blt(self, rs1, rs2, t): self._b(4, rs1, rs2, t)
    def bge(self, rs1, rs2, t): self._b(5, rs1, rs2, t)
    def bltu(self, rs1, rs2, t): self._b(6, rs1, rs2, t)
    def bgeu(self, rs1, rs2, t): self._b(7, rs1, rs2, t)

    def jal(self, rd, target: Label | int):
        off = target if isinstance(target, int) \
            else self._offset(target, "j")
        self.word(_enc_j(rd, off))

    def jalr(self, rd, rs1, imm):
        self.word(_enc_i(0b1100111, 0, rd, rs1, imm))

    def lui(self, rd, imm20): self.word(_enc_u(0b0110111, rd, imm20))
    def auipc(self, rd, imm20): self.word(_enc_u(0b0010111, rd, imm20))

    def j(self, target: Label | int): self.jal(0, target)
    def mv(self, rd, rs): self.addi(rd, rs, 0)
    def nop(self): self.addi(0, 0, 0)

    def li(self, rd, value: int):
        """Load 32-bit constant (lui+addi when needed)."""
        value &= 0xFFFFFFFF
        lo = value & 0xFFF
        if lo >= 0x800:
            lo -= 0x1000
        hi = (value - lo) & 0xFFFFFFFF
        if hi:
            self.lui(rd, hi >> 12)
            if lo:
                self.addi(rd, rd, lo)
        else:
            self.addi(rd, 0, lo)

    # -- RV32M ----------------------------------------------------------------

    def _m(self, f3, rd, rs1, rs2):
        self.word(_enc_r(0b0110011, f3, 0x01, rd, rs1, rs2))

    def mul(self, rd, rs1, rs2): self._m(0, rd, rs1, rs2)
    def mulh(self, rd, rs1, rs2): self._m(1, rd, rs1, rs2)
    def mulhsu(self, rd, rs1, rs2): self._m(2, rd, rs1, rs2)
    def mulhu(self, rd, rs1, rs2): self._m(3, rd, rs1, rs2)
    def div(self, rd, rs1, rs2): self._m(4, rd, rs1, rs2)
    def divu(self, rd, rs1, rs2): self._m(5, rd, rs1, rs2)
    def rem(self, rd, rs1, rs2): self._m(6, rd, rs1, rs2)
    def remu(self, rd, rs1, rs2): self._m(7, rd, rs1, rs2)

    # -- system / io intrinsics (custom-0; reference guest
    #    crates/toolchain/openvm/src/io + rv32im guest encodings) ------------

    def terminate(self, code: int = 0):
        self.word(_enc_i(OP_CUSTOM0, 0b000, 0, 0, code))

    def hint_input(self):
        """Pop the next input item onto the hint buffer (phantom HintInput,
        reference io::read* preamble)."""
        self.word(_enc_i(OP_CUSTOM0, 0b011, 0, 0, 0x0))

    def hint_random(self, rd):
        self.word(_enc_i(OP_CUSTOM0, 0b011, rd, 0, 0x2))

    def ct_start(self, span_id: int = 0):
        """Cycle-tracker span start (reference cycle tracker role;
        span_id labels the region in `cycles` metrics)."""
        self.word(_enc_i(OP_CUSTOM0, 0b011, span_id, 0, 0x10))

    def ct_end(self):
        self.word(_enc_i(OP_CUSTOM0, 0b011, 0, 0, 0x11))

    def hint_storew(self, rd_ptr):
        """Store next 4 hint bytes to [rd_ptr] (HINT_STOREW)."""
        self.word(_enc_i(OP_CUSTOM0, 0b001, rd_ptr, 0, 0))

    def hint_buffer(self, rd_ptr, rs1_words):
        """Store 4*rs1_words hint bytes starting at [rd_ptr]
        (HINT_BUFFER)."""
        self.word(_enc_i(OP_CUSTOM0, 0b001, rd_ptr, rs1_words, 1))

    def reveal(self, rs1, pv_index: int, rd: int = 0):
        """Write register rs1 to user-public-value word pv_index."""
        self.word(_enc_i(OP_CUSTOM0, 0b010, rd, rs1, 4 * pv_index))

    def read_word(self, rd, scratch):
        """io::read_u32 idiom over a 4-byte input item: hint_input pushes
        [len:u32][bytes] onto the hint stream (reference hint protocol);
        skip the length word, then load the payload word into rd (scratch
        must hold a valid RAM address)."""
        self.hint_input()
        self.hint_storew(scratch)  # length word (discarded)
        self.hint_storew(scratch)  # payload word
        self.lw(rd, scratch, 0)

    # -- keccak256 / sha256 (custom-0 funct3=100; reference
    #    extensions/{keccak256,sha256}/guest) ---------------------------------

    def keccak256(self, rd_dst, rs1_src, rs2_len):
        self.word(_enc_r(OP_CUSTOM0, 0b100, 0, rd_dst, rs1_src, rs2_len))

    def sha256(self, rd_dst, rs1_src, rs2_len):
        self.word(_enc_r(OP_CUSTOM0, 0b100, 1, rd_dst, rs1_src, rs2_len))

    # -- int256 (custom-0 funct3=101/110; reference extensions/bigint/guest) --

    def _i256(self, funct7, rd, rs1, rs2):
        self.word(_enc_r(OP_CUSTOM0, 0b101, funct7, rd, rs1, rs2))

    def add256(self, rd, rs1, rs2): self._i256(0, rd, rs1, rs2)
    def sub256(self, rd, rs1, rs2): self._i256(1, rd, rs1, rs2)
    def xor256(self, rd, rs1, rs2): self._i256(2, rd, rs1, rs2)
    def or256(self, rd, rs1, rs2): self._i256(3, rd, rs1, rs2)
    def and256(self, rd, rs1, rs2): self._i256(4, rd, rs1, rs2)
    def sll256(self, rd, rs1, rs2): self._i256(5, rd, rs1, rs2)
    def srl256(self, rd, rs1, rs2): self._i256(6, rd, rs1, rs2)
    def sra256(self, rd, rs1, rs2): self._i256(7, rd, rs1, rs2)
    def slt256(self, rd, rs1, rs2): self._i256(8, rd, rs1, rs2)
    def sltu256(self, rd, rs1, rs2): self._i256(9, rd, rs1, rs2)
    def mul256(self, rd, rs1, rs2): self._i256(10, rd, rs1, rs2)

    def beq256(self, rs1, rs2, target: Label | int):
        off = target if isinstance(target, int) \
            else self._offset(target, "b256")
        self.word((_enc_b(0b110, rs1, rs2, off) & ~0x7F) | OP_CUSTOM0)

    # -- modular arithmetic (custom-1 funct3=000; reference
    #    extensions/algebra/guest, funct7 = mod_idx*8 + base) -----------------

    def _mod(self, base, mod_idx, rd, rs1, rs2):
        self.word(_enc_r(OP_CUSTOM1, 0b000, mod_idx * 8 + base,
                         rd, rs1, rs2))

    def addmod(self, rd, rs1, rs2, mod_idx=0):
        self._mod(0, mod_idx, rd, rs1, rs2)

    def submod(self, rd, rs1, rs2, mod_idx=0):
        self._mod(1, mod_idx, rd, rs1, rs2)

    def mulmod(self, rd, rs1, rs2, mod_idx=0):
        self._mod(2, mod_idx, rd, rs1, rs2)

    def divmod_(self, rd, rs1, rs2, mod_idx=0):
        self._mod(3, mod_idx, rd, rs1, rs2)

    def iseqmod(self, rd, rs1, rs2, mod_idx=0):
        self._mod(4, mod_idx, rd, rs1, rs2)

    # -- short Weierstrass (custom-1 funct3=001; reference
    #    extensions/ecc/guest, funct7 = curve_idx*8 + base) -------------------

    def ec_add_ne(self, rd, rs1, rs2, curve_idx=0):
        self.word(_enc_r(OP_CUSTOM1, 0b001, curve_idx * 8 + 0, rd, rs1, rs2))

    def ec_double(self, rd, rs1, curve_idx=0):
        self.word(_enc_r(OP_CUSTOM1, 0b001, curve_idx * 8 + 1, rd, rs1, 0))

    # -- Fp2 (custom-1 funct3=010; reference extensions/algebra fp2) ----------

    def _fp2(self, base, fp2_idx, rd, rs1, rs2):
        self.word(_enc_r(OP_CUSTOM1, 0b010, fp2_idx * 8 + base, rd, rs1, rs2))

    def fp2_add(self, rd, rs1, rs2, fp2_idx=0):
        self._fp2(0, fp2_idx, rd, rs1, rs2)

    def fp2_sub(self, rd, rs1, rs2, fp2_idx=0):
        self._fp2(1, fp2_idx, rd, rs1, rs2)

    def fp2_mul(self, rd, rs1, rs2, fp2_idx=0):
        self._fp2(2, fp2_idx, rd, rs1, rs2)

    def fp2_div(self, rd, rs1, rs2, fp2_idx=0):
        self._fp2(3, fp2_idx, rd, rs1, rs2)

    # -- pairing (custom-1 funct3=011; reference extensions/pairing) ----------

    def pairing_hint_final_exp(self, rs1, rs2, pairing_idx=0):
        self.word(_enc_r(OP_CUSTOM1, 0b011, pairing_idx * 16, 0, rs1, rs2))

    # -- build -----------------------------------------------------------------

    def build(self, pc_start: int | None = None):
        """Transpile to a VmExe (errors on unplaced labels)."""
        from ..vm import Transpiler, VmExe
        from ..vm.instructions import Program

        dangling = [lbl for lbl in self._labels if lbl.fixups]
        if dangling:
            raise ValueError(
                f"unplaced labels with pending branches: "
                f"{[lbl.name or '<anon>' for lbl in dangling]}")
        prog = Program(
            instructions=Transpiler().transpile(list(self.words)),
            pc_base=self.pc_base)
        return VmExe(program=prog,
                     pc_start=self.pc_base if pc_start is None else pc_start,
                     init_memory=dict(self.init_memory))
