"""Guest authoring toolchain: write guest programs in-repo.

The reference builds guests from Rust via `cargo openvm build`
(crates/toolchain/build) with a guest stdlib (crates/toolchain/openvm) and
intrinsic macros (custom_insn_r!/i!, moduli_init!, sw_init! — SURVEY.md
section 2.18).  No RISC-V compiler ships in this image, so the TPU-native
equivalent is an in-repo assembler with the same intrinsic surface: every
custom-instruction encoding the transpiler accepts (reveal, hints, keccak,
sha256, int256, modular, ecc, fp2, pairing) has a named emitter here, plus
full RV32IM with labels and a data section.  `Assembler.build()` returns a
`VmExe` that runs/proves like a transpiled ELF.
"""

from .asm import Assembler, x  # noqa: F401
