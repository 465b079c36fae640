"""CLI: run / prove / verify / bench guest programs.

Mirrors the reference cargo-openvm subcommand surface (reference
crates/cli/src/bin/cargo-openvm.rs:24-37: build, commit, keygen, init,
prove, run, setup, verify) for the parts ported so far.

Usage:  python -m openvm_tpu.cli run guest.elf [--input hex ...]
        python -m openvm_tpu.cli prove guest.elf --out proof.pkl
        python -m openvm_tpu.cli verify guest.elf proof.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time


def _load_exe(path: str):
    """Load a guest: RISC-V ELF or a built `.vmexe` artifact."""
    if path.endswith(".vmexe"):
        with open(path, "rb") as f:
            return pickle.load(f)
    from .sdk import Sdk
    return Sdk.transpile(open(path, "rb").read())


def _parse_inputs(items):
    out = []
    for h in items or []:
        try:
            out.append(bytes.fromhex(h))
        except ValueError:
            sys.exit(f"error: --input {h!r} is not valid hex")
    return out


def cmd_run(args):
    sdk = _sdk_for(args)
    exe = _load_exe(args.elf)
    inputs = _parse_inputs(args.input)
    from .vm.interpreter import ExecutionError
    try:
        st = sdk.execute(exe, inputs=[list(b) for b in inputs])
    except (RuntimeError, ExecutionError) as ex:
        sys.exit(f"error: execution failed: {ex}")
    pvs = bytes(st.public_values.get(i, 0) for i in range(32))
    print(f"exit_code={st.exit_code} instret={st.instret}")
    print(f"public_values={pvs.hex()}")
    return 0 if st.exit_code == 0 else 1


def _sdk_for(args):
    from .sdk import Sdk
    if getattr(args, "config", None):
        from .vm_config import load_vm_config
        try:
            cfg = load_vm_config(args.config)
        except FileNotFoundError:
            sys.exit(f"error: config file not found: {args.config}")
        except (ValueError, KeyError) as ex:
            sys.exit(f"error: bad config {args.config}: {ex}")
        if getattr(args, "bigint", False):
            cfg.bigint = True
        return Sdk(cfg)
    if getattr(args, "bigint", False):
        from .vm.machine import Rv32Config
        return Sdk(Rv32Config(bigint=True))
    return Sdk()


def cmd_prove(args):
    sdk = _sdk_for(args)
    exe = _load_exe(args.elf)
    inputs = [list(b) for b in _parse_inputs(args.input)]
    t0 = time.time()
    pk = sdk.app_keygen(exe)
    print(f"keygen: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    proof = sdk.prove(pk, exe, inputs=inputs, max_insns=args.max_insns)
    print(f"prove: {time.time() - t0:.1f}s", file=sys.stderr)
    with open(args.out, "wb") as f:
        pickle.dump(proof, f)
    print(f"proof written to {args.out}")
    return 0


def cmd_verify(args):
    sdk = _sdk_for(args)
    exe = _load_exe(args.elf)
    with open(args.proof, "rb") as f:
        proof = pickle.load(f)
    pk = sdk.app_keygen(exe)
    result = sdk.verify_app_proof(pk, proof)
    print(f"verified: pcs ok, exit 0; pvs={result['public_values'][:8]}...")
    return 0


def cmd_build(args):
    """Assemble a Python guest source into a .vmexe artifact.

    The reference's `cargo openvm build` compiles a Rust guest crate to an
    ELF (crates/toolchain/build); this framework's guests are authored with
    `openvm_tpu.guest.Assembler` in a Python file that defines
    `build() -> Assembler | VmExe` (no RISC-V toolchain required)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location("guest_src", args.source)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as ex:
        sys.exit(f"error: guest source failed to import: {ex}")
    if not hasattr(mod, "build"):
        sys.exit("error: guest source must define build() -> "
                 "Assembler | VmExe")
    obj = mod.build()
    from .guest import Assembler
    exe = obj.build() if isinstance(obj, Assembler) else obj
    out = args.out or os.path.splitext(args.source)[0] + ".vmexe"
    with open(out, "wb") as f:
        pickle.dump(exe, f)
    n = sum(i is not None for i in exe.program.instructions)
    print(f"built {out}: {n} instructions, "
          f"{len(exe.init_memory)} init-memory bytes")
    return 0


def cmd_commit(args):
    """Print the program / init-memory / executable commitments
    (reference `cargo openvm commit`, AppExecutionCommit)."""
    from .vm.machine import VirtualMachine
    sdk = _sdk_for(args)
    exe = _load_exe(args.elf)
    vm = VirtualMachine(sdk.config)  # commitments don't need the pk
    prog = "".join(f"{int(v):08x}" for v in vm.commit_exe(exe))
    print(f"program_commit=0x{prog}")
    init = "".join(f"{int(v):08x}" for v in vm.commit_init_memory(exe))
    print(f"init_memory_root=0x{init}")
    return 0


def cmd_setup(args):
    """Build and disk-cache the proving key (reference `cargo openvm
    setup` / keygen artifact cache, SDK fs.rs role)."""
    from .vm.machine import VirtualMachine
    sdk = _sdk_for(args)
    vm = VirtualMachine(sdk.config)
    t0 = time.time()
    vm.keygen(cache=True)
    n_airs = len(vm.airs)
    import os
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "openvm_tpu_pk")
    print(f"proving key ready: {n_airs} AIRs, {time.time() - t0:.1f}s "
          f"(cache: {cache_dir})")
    return 0


_INIT_TOML = """\
# openvm-tpu VM config (reference openvm.toml / SdkVmConfig)
[app_vm_config.rv32i]
[app_vm_config.rv32m]
[app_vm_config.io]

# enable extensions by uncommenting:
# [app_vm_config.bigint]
# [app_vm_config.keccak]
# [app_vm_config.sha256]
# [app_vm_config.modular]
# supported_moduli = ["0xfffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f"]
# [app_vm_config.ecc]
# supported_curves = ["secp256k1"]
"""


def cmd_init(args):
    """Write an openvm.toml scaffold (reference `cargo openvm init`)."""
    import os
    path = args.path or "openvm.toml"
    if os.path.exists(path) and not args.force:
        sys.exit(f"error: {path} exists (use --force to overwrite)")
    with open(path, "w") as f:
        f.write(_INIT_TOML)
    print(f"wrote {path}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="openvm-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pb = sub.add_parser("build",
                        help="assemble a Python guest into a .vmexe")
    pb.add_argument("source", help="guest .py defining build()")
    pb.add_argument("--out", default=None)
    pb.set_defaults(fn=cmd_build)

    pc = sub.add_parser("commit", help="print executable commitments")
    pc.add_argument("elf")
    pc.add_argument("--config", help="openvm.toml VM config")
    pc.add_argument("--bigint", action="store_true")
    pc.set_defaults(fn=cmd_commit)

    ps = sub.add_parser("setup",
                        help="build + cache the proving key")
    ps.add_argument("--config", help="openvm.toml VM config")
    ps.add_argument("--bigint", action="store_true")
    ps.set_defaults(fn=cmd_setup)
    pk = sub.add_parser("keygen", help="alias of setup")
    pk.add_argument("--config", help="openvm.toml VM config")
    pk.add_argument("--bigint", action="store_true")
    pk.set_defaults(fn=cmd_setup)

    pi = sub.add_parser("init", help="write an openvm.toml scaffold")
    pi.add_argument("--path", default=None)
    pi.add_argument("--force", action="store_true")
    pi.set_defaults(fn=cmd_init)

    pr = sub.add_parser("run", help="execute a guest ELF (E1)")
    pr.add_argument("elf")
    pr.add_argument("--input", action="append",
                    help="hex-encoded input stream item")
    pr.add_argument("--config", help="openvm.toml VM config")
    pr.set_defaults(fn=cmd_run)

    pp = sub.add_parser("prove", help="prove a guest ELF")
    pp.add_argument("elf")
    pp.add_argument("--input", action="append")
    pp.add_argument("--out", default="proof.pkl")
    pp.add_argument("--max-insns", type=int, default=None)
    pp.add_argument("--bigint", action="store_true",
                    help="enable the Int256 extension chips")
    pp.add_argument("--config", help="openvm.toml VM config")
    pp.set_defaults(fn=cmd_prove)

    pv = sub.add_parser("verify", help="verify a proof")
    pv.add_argument("elf")
    pv.add_argument("proof")
    pv.add_argument("--bigint", action="store_true",
                    help="enable the Int256 extension chips")
    pv.add_argument("--config", help="openvm.toml VM config")
    pv.set_defaults(fn=cmd_verify)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
