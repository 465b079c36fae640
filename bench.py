"""Benchmark: full VM proof throughput (+ trace-commit microbench).

Default mode proves a hand-assembled RV32IM fibonacci guest end-to-end on
the default accelerator — metered/preflight execution, 15-AIR tracegen,
multi-trace STARK (commit, LogUp, quotient, FRI) with the production FRI
config — and reports proved instructions/second, the reference's
total_proof_time_ms figure of merit normalized by workload
(docs/crates/metrics.md).  vs_baseline compares against this host's CPU
running the identical pipeline at BENCH_VM_CPU_N iterations (the reference
publishes no absolute numbers; BASELINE.json.published={}).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

BENCH_MODE=commit switches to the round-1 trace-commit microbench
(coset LDE + Poseidon2-Merkle commit, cells/s); BENCH_MODE=synthetic
proves the round-1 hand-assembled fibonacci guest; BENCH_MODE=keccak
proves the reference's real keccak256 guest ELF with continuations.
The default mode proves the reference's REAL compiler-generated
`fibonacci` guest ELF (benchmarks/guest/fibonacci, n = BENCH_FIB_N fed
via the hint stream) and falls back to synthetic when /root/reference
is absent.
"""

import json
import os
import subprocess
import sys
import time

LOG_N = int(os.environ.get("BENCH_LOG_N", "14"))
WIDTH = int(os.environ.get("BENCH_WIDTH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
VM_N = int(os.environ.get("BENCH_VM_N", "20000"))
VM_CPU_N = int(os.environ.get("BENCH_VM_CPU_N", "2500"))
FIB_N = int(os.environ.get("BENCH_FIB_N", "30000"))
FIB_CPU_N = int(os.environ.get("BENCH_FIB_CPU_N", "1000"))

REAL_FIB_ELF = ("/root/reference/benchmarks/guest/fibonacci/elf/"
                "openvm-fibonacci-program.elf")
REAL_KECCAK_ELF = ("/root/reference/benchmarks/guest/keccak256/elf/"
                   "openvm-keccak256-program.elf")
# executor set covering the fibonacci guest's executed instruction mix
REAL_ELF_EXECUTORS = ("alu", "lt", "beq", "blt", "jal_lui", "jalr",
                      "auipc", "loadstore", "shift", "hintstore")


def run_commit_bench() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openvm_tpu import merkle, ntt
    from openvm_tpu.field import babybear as bb

    n = 1 << LOG_N

    @jax.jit
    def commit_root(trace):
        lde = ntt.coset_lde(trace, 1)
        layers = merkle.commit_layers([lde])
        return layers[-1][0]

    rng = np.random.default_rng(0)
    trace_np = rng.integers(0, bb.P, size=(n, WIDTH), dtype=np.uint64)
    trace = bb.to_monty(jnp.asarray(trace_np.astype(np.uint32)))
    trace.block_until_ready()

    commit_root(trace).block_until_ready()  # compile
    t0 = time.time()
    for _ in range(ITERS):
        out = commit_root(trace)
    out.block_until_ready()
    dt = (time.time() - t0) / ITERS
    return n * WIDTH / dt


def run_vm_prove(n_iters: int) -> dict:
    """Full proof of the fibonacci guest; returns timing breakdown."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.test_vm_prove import FIB_EXECUTORS, build_fib_program
    from openvm_tpu.vm.machine import Rv32Config, VirtualMachine

    exe = build_fib_program(n_iters)
    vm = VirtualMachine(Rv32Config(executors=FIB_EXECUTORS))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    t0 = time.time()
    vm.keygen()
    t_keygen = time.time() - t0
    t0 = time.time()
    proof, pre = vm.prove(exe)
    t_prove = time.time() - t0
    if t_prove < budget_s / 3:
        # warm: re-measure steady-state (one-time compiles amortized)
        t0 = time.time()
        proof, pre = vm.prove(exe)
        t_prove = time.time() - t0
    vm.verify(proof)
    cells = sum((1 << p.log_degree)
                * (vm.airs[p.air_id].width
                   + sum(vm.airs[p.air_id].cached_main_widths))
                for p in proof.per_air)
    return {"insns": pre.instret, "prove_s": t_prove, "keygen_s": t_keygen,
            "insn_per_s": pre.instret / t_prove,
            "cells": cells, "cells_per_s": cells / t_prove}


def run_real_elf_prove(n_loop: int, emit_partial=None) -> dict:
    """Full proof of the reference's real fibonacci guest ELF
    (benchmarks/guest/fibonacci: reads u64 n from the hint stream, loops,
    reveals fib(n) mod 2^64).  Returns timing breakdown.

    Budget discipline (round-2 AND round-4 postmortems: BENCH_r02/r04 both
    timed out with rc 124 and recorded nothing): the partial result is
    emitted via `emit_partial` IMMEDIATELY after the cold prove, so a
    driver timeout during the warm re-measure still records a number; and
    the warm re-measure runs only when the cold prove (which pays every
    one-time XLA compile) fits within BENCH_BUDGET_S/3.
    """
    from openvm_tpu.vm.elf import load_elf
    from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
    from openvm_tpu.vm.transpiler import transpile_elf

    exe = transpile_elf(load_elf(open(REAL_FIB_ELF, "rb").read()))
    inputs = [list(int(n_loop).to_bytes(8, "little"))]
    vm = VirtualMachine(Rv32Config(executors=REAL_ELF_EXECUTORS))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    t0 = time.time()
    vm.keygen()
    t_keygen = time.time() - t0
    t0 = time.time()
    proof, pre = vm.prove(exe, inputs=inputs)
    t_cold = time.time() - t0
    cells = sum((1 << p.log_degree)
                * (vm.airs[p.air_id].width
                   + sum(vm.airs[p.air_id].cached_main_widths))
                for p in proof.per_air)
    res = {"insns": pre.instret, "prove_s": t_cold, "cold_prove_s": t_cold,
           "keygen_s": t_keygen,
           "insn_per_s": pre.instret / t_cold,
           "cells": cells, "cells_per_s": cells / t_cold}
    if emit_partial is not None:
        emit_partial(res)
    # steady-state measurement: the cold prove above paid every one-time
    # XLA compile/trace (in-process jit cache + persistent cache); the
    # warm prove is the per-proof figure of merit (the reference's
    # kernels are AOT-compiled Rust/CUDA — its per-proof time has no JIT
    # either).  Round-5 measurement: warm is ~1/10 of a cache-warm cold
    # (45.6s vs 517s at FIB_N=30000), so budget the warm re-measure at
    # cold/2 against what remains — the old `t_cold < budget/3` guard
    # skipped the warm prove exactly when it mattered most.
    if t_keygen + t_cold + max(t_cold / 2, 60) < budget_s:
        t0 = time.time()
        proof, pre = vm.prove(exe, inputs=inputs)
        t_prove = time.time() - t0
        res.update(prove_s=t_prove, insn_per_s=pre.instret / t_prove,
                   cells_per_s=cells / t_prove)
    vm.verify(proof)
    return res


def run_keccak_elf_prove() -> dict:
    """Continuations proof of the reference's real keccak256 guest ELF
    (benchmarks/guest/keccak256) — metered trace-height segmentation,
    keccak extension chips, segment verification chain."""
    from openvm_tpu.vm.elf import load_elf
    from openvm_tpu.vm.machine import Rv32Config, VirtualMachine
    from openvm_tpu.vm.transpiler import transpile_elf

    exe = transpile_elf(load_elf(open(REAL_KECCAK_ELF, "rb").read()))
    vm = VirtualMachine(Rv32Config(keccak=True, persistent=True))
    t0 = time.time()
    vm.keygen()
    t_keygen = time.time() - t0
    t0 = time.time()
    proofs = vm.prove_continuations(exe)
    t_prove = time.time() - t0
    vm.verify_segments(proofs, exe)
    insns = 4325750  # E1 instret of this guest (fixed workload)
    return {"insns": insns, "segments": len(proofs),
            "prove_s": t_prove, "keygen_s": t_keygen,
            "insn_per_s": insns / t_prove}


def main():
    mode = os.environ.get("BENCH_MODE", "vm_prove")
    if mode == "vm_prove" and not os.path.exists(REAL_FIB_ELF):
        mode = "synthetic"
    if mode == "commit":
        if os.environ.get("BENCH_BACKEND") == "cpu":
            import jax
            jax.config.update("jax_platforms", "cpu")
            print(json.dumps({"cells_per_sec": run_commit_bench()}))
            return
        tpu_cells = run_commit_bench()
        cpu_cells = None
        try:
            env = dict(os.environ, BENCH_BACKEND="cpu", BENCH_MODE="commit",
                       BENCH_LOG_N=str(max(LOG_N - 2, 10)))
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True, timeout=900)
            for line in out.stdout.splitlines():
                if line.strip().startswith("{"):
                    cpu_cells = json.loads(line)["cells_per_sec"]
        except Exception:
            pass
        print(json.dumps({
            "metric": "trace_commit_throughput",
            "value": round(tpu_cells, 1), "unit": "cells/s",
            "vs_baseline": round(tpu_cells / cpu_cells, 3)
            if cpu_cells else 1.0}))
        return

    if mode == "vm_prove_cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(run_vm_prove(VM_CPU_N)))
        return

    if mode == "real_elf_cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(run_real_elf_prove(FIB_CPU_N)))
        return

    if mode == "pin_cpu":
        # one-off: measure the CPU baselines and pin them to
        # bench_baseline.json (committed; later runs read vs_baseline here)
        import jax
        jax.config.update("jax_platforms", "cpu")
        import platform
        pin = {"host": platform.node(),
               "pinned_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
        res = run_real_elf_prove(FIB_CPU_N)
        pin["real_elf_cpu"] = {"insn_per_s": res["insn_per_s"],
                               "insns": res["insns"],
                               "prove_s": res["prove_s"]}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_baseline.json")
        with open(path, "w") as f:
            json.dump(pin, f, indent=1)
        print(json.dumps(pin))
        return

    if mode == "keccak":
        res = run_keccak_elf_prove()
        print(json.dumps({
            "metric": "keccak256_guest_proof_throughput",
            "value": round(res["insn_per_s"], 1), "unit": "insn/s",
            "vs_baseline": 1.0,
            "insns": res["insns"], "segments": res["segments"],
            "proof_time_s": round(res["prove_s"], 2)}))
        return

    def _cpu_sub_rate(cpu_mode, timeout_s=300):
        """CPU-baseline insn/s: served from the pinned measurement in
        bench_baseline.json (committed, measured once per host with
        BENCH_PIN_CPU=1) so the driver-run bench never pays a second full
        pipeline.  Falls back to a subprocess run under a hard 300 s cap
        only when no pin exists and BENCH_CPU=1 opts in."""
        pin_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_baseline.json")
        try:
            with open(pin_path) as f:
                pin = json.load(f)
            if cpu_mode in pin:
                return pin[cpu_mode]["insn_per_s"]
        except Exception:
            pass
        if not os.environ.get("BENCH_CPU"):
            return None
        try:
            env = dict(os.environ, BENCH_MODE=cpu_mode)
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True,
                                 timeout=timeout_s)
            for line in out.stdout.splitlines():
                if line.strip().startswith("{"):
                    return json.loads(line)["insn_per_s"]
        except Exception:
            pass
        return None

    if mode == "synthetic":
        res = run_vm_prove(VM_N)
        cpu_rate = _cpu_sub_rate("vm_prove_cpu")
        metric = "vm_full_proof_throughput"
        _emit_line(metric, res, cpu_rate)
    else:  # vm_prove on the real guest ELF
        # cpu_rate first (a file read of the committed pin) so the partial
        # emit right after the cold prove already carries vs_baseline
        cpu_rate = _cpu_sub_rate("real_elf_cpu")
        metric = "real_elf_full_proof_throughput"
        res = run_real_elf_prove(
            FIB_N, emit_partial=lambda r: _emit_line(metric, r, cpu_rate,
                                                     partial=True))
        _emit_line(metric, res, cpu_rate)


def _emit_line(metric, res, cpu_rate, partial=False):
    line = {
        "metric": metric,
        "value": round(res["insn_per_s"], 1),
        "unit": "insn/s",
        "vs_baseline": round(res["insn_per_s"] / cpu_rate, 3)
        if cpu_rate else 1.0,
        "insns": res["insns"],
        "proof_time_s": round(res["prove_s"], 2),
        "cold_prove_s": round(res.get("cold_prove_s", res["prove_s"]), 2),
        "trace_cells_per_s": round(res["cells_per_s"], 1)}
    if partial:
        line["partial"] = True
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
