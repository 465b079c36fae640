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


def main(argv=None):
    p = argparse.ArgumentParser(prog="openvm-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

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
