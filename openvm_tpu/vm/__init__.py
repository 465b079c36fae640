"""VM framework: instructions, ELF loading, transpiler, interpreters, chips.

Layers L0/L3/L4 of the framework (SURVEY.md sections 2.1, 2.3, 2.4).
"""

from .elf import Elf, load_elf
from .instructions import (DEFAULT_PC_STEP, Instruction, Program, VmExe,
                           RV32_MEMORY_AS, RV32_REGISTER_AS)
from .interpreter import ExecutionError, Interpreter, Streams, VmState
from .transpiler import Transpiler, transpile_elf

__all__ = [
    "DEFAULT_PC_STEP", "Elf", "ExecutionError", "Instruction", "Interpreter",
    "Program", "RV32_MEMORY_AS", "RV32_REGISTER_AS", "Streams", "Transpiler",
    "VmExe", "VmState", "load_elf", "transpile_elf",
]
