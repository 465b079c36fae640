"""CLI subcommand surface: build / run / commit / init / verify-fail paths
(reference cargo-openvm subcommands, crates/cli/src/bin/cargo-openvm.rs).

Proving subcommands are covered via the SDK tests; here we exercise the
artifact flow: Python guest source -> .vmexe -> run/commit.
"""

import os
import subprocess
import sys

import pytest

GUEST_SRC = '''\
from openvm_tpu.guest import Assembler, x


def build():
    a = Assembler()
    a.li(x[1], 0)
    a.li(x[2], 1)
    a.li(x[3], 10)
    loop = a.label_here()
    a.add(x[4], x[1], x[2])
    a.mv(x[1], x[2])
    a.mv(x[2], x[4])
    a.addi(x[3], x[3], -1)
    a.bne(x[3], x[0], loop)
    a.reveal(x[1], 0)
    a.terminate()
    return a
'''


def run_cli(*argv, cwd=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "openvm_tpu.cli", *argv],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=cwd or os.path.dirname(os.path.dirname(__file__)))


def test_build_run_commit(tmp_path):
    src = tmp_path / "guest.py"
    src.write_text(GUEST_SRC)
    out = run_cli("build", str(src))
    assert out.returncode == 0, out.stderr
    vmexe = str(src)[:-3] + ".vmexe"
    assert os.path.exists(vmexe)
    assert "instructions" in out.stdout

    out = run_cli("run", vmexe)
    assert out.returncode == 0, out.stderr
    assert "exit_code=0" in out.stdout
    # fib(10) = 55 revealed at pv word 0
    assert "public_values=37000000" in out.stdout

    out = run_cli("commit", vmexe)
    assert out.returncode == 0, out.stderr
    assert "program_commit=0x" in out.stdout
    assert "init_memory_root=0x" in out.stdout
    # deterministic: same exe -> same commitment
    out2 = run_cli("commit", vmexe)
    assert out2.stdout == out.stdout


def test_init_scaffold(tmp_path):
    out = run_cli("init", "--path", str(tmp_path / "openvm.toml"))
    assert out.returncode == 0, out.stderr
    text = (tmp_path / "openvm.toml").read_text()
    from openvm_tpu.vm_config import config_from_dict
    import tomllib
    cfg = config_from_dict(tomllib.loads(text))
    assert "alu" in cfg.executors and "mul" in cfg.executors
    # refuses to clobber without --force
    out = run_cli("init", "--path", str(tmp_path / "openvm.toml"))
    assert out.returncode != 0


def test_build_rejects_bad_source(tmp_path):
    src = tmp_path / "bad.py"
    src.write_text("nothing_here = 1\n")
    out = run_cli("build", str(src))
    assert out.returncode != 0
    assert "must define build()" in (out.stdout + out.stderr)


def test_config_fri_and_extensions(tmp_path):
    toml = tmp_path / "cfg.toml"
    toml.write_text(
        "[app_vm_config.rv32i]\n[app_vm_config.io]\n"
        "[app_vm_config.keccak]\n"
        "[app_vm_config.system]\ncontinuations = true\n"
        "[fri_params]\nlog_blowup = 1\nnum_queries = 2\n"
        "proof_of_work_bits = 1\n")
    from openvm_tpu.vm_config import load_vm_config
    cfg = load_vm_config(str(toml))
    assert cfg.keccak and cfg.persistent
    assert cfg.stark.fri.num_queries == 2
