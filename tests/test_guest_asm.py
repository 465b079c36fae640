"""Guest-authoring assembler: programs written with openvm_tpu.guest
execute correctly (E1) and match hand-computed semantics.

Covers the toolchain role of reference crates/toolchain/openvm +
custom_insn macros (SURVEY.md section 2.18): RV32IM emission, labels with
forward/backward fixups, data sections, io intrinsics (hint stream,
reveal), and extension intrinsics (keccak256, int256).
"""

from openvm_tpu.guest import Assembler, x
from openvm_tpu.vm.interpreter import Interpreter


def test_fib_loop_labels_and_reveal():
    a = Assembler()
    a.li(x[1], 0)
    a.li(x[2], 1)
    a.li(x[3], 10)
    loop = a.label_here("loop")
    a.add(x[4], x[1], x[2])
    a.mv(x[1], x[2])
    a.mv(x[2], x[4])
    a.addi(x[3], x[3], -1)
    a.bne(x[3], x[0], loop)
    a.reveal(x[1], 0)
    a.terminate()
    st = Interpreter(a.build()).execute()
    assert st.exit_code == 0
    fib10 = 55
    got = int.from_bytes(bytes(st.public_values.get(i, 0)
                               for i in range(4)), "little")
    assert got == fib10


def test_forward_branch_and_mul():
    a = Assembler()
    done = a.label("done")
    a.li(x[5], 7)
    a.li(x[6], 6)
    a.mul(x[7], x[5], x[6])
    a.li(x[8], 42)
    a.beq(x[7], x[8], done)
    a.li(x[7], 0)          # skipped when mul is correct
    a.place(done)
    a.reveal(x[7], 0)
    a.terminate()
    st = Interpreter(a.build()).execute()
    assert st.exit_code == 0
    assert st.public_values.get(0, 0) == 42


def test_data_section_and_hint_stream():
    a = Assembler()
    addr = a.data((1234).to_bytes(4, "little"))
    a.li(x[1], addr)
    a.lw(x[2], x[1], 0)     # x2 = 1234 from init memory
    # read one u32 from the input stream
    a.li(x[3], 0x2000)
    a.read_word(x[4], x[3])
    a.add(x[5], x[2], x[4])
    a.reveal(x[5], 0)
    a.terminate()
    st = Interpreter(a.build()).execute(
        inputs=[list((66).to_bytes(4, "little"))])
    assert st.exit_code == 0
    got = int.from_bytes(bytes(st.public_values.get(i, 0)
                               for i in range(4)), "little")
    assert got == 1300


def test_keccak256_intrinsic():
    msg = b"openvm-tpu guest"
    a = Assembler()
    src = a.data(msg)
    dst = 0x3000
    a.li(x[10], dst)
    a.li(x[11], src)
    a.li(x[12], len(msg))
    a.keccak256(x[10], x[11], x[12])
    a.lw(x[5], x[10], 0)
    a.reveal(x[5], 0)
    a.terminate()
    st = Interpreter(a.build()).execute()
    assert st.exit_code == 0
    from openvm_tpu.vm.circuit.keccak import keccak256 as keccak_oracle
    want = keccak_oracle(msg)
    got = bytes(st.memory[dst:dst + 32])
    assert got == want
    assert bytes(st.public_values.get(i, 0) for i in range(4)) == want[:4]


def test_int256_intrinsics():
    va = 3**80
    vb = 5**55
    a = Assembler()
    pa = a.data(va.to_bytes(32, "little"))
    pb = a.data(vb.to_bytes(32, "little"))
    pc = 0x4000
    a.li(x[10], pc)
    a.li(x[11], pa)
    a.li(x[12], pb)
    a.add256(x[10], x[11], x[12])
    a.mul256(x[10], x[10], x[12])
    a.terminate()
    st = Interpreter(a.build()).execute()
    assert st.exit_code == 0
    want = ((va + vb) * vb) % (1 << 256)
    got = int.from_bytes(bytes(st.memory[pc:pc + 32]), "little")
    assert got == want


def test_unplaced_label_rejected():
    import pytest
    a = Assembler()
    lbl = a.label("nowhere")
    a.beq(x[0], x[0], lbl)
    a.terminate()
    with pytest.raises(ValueError, match="nowhere"):
        a.build()
