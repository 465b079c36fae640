"""Benchmark: STARK trace-commitment throughput on the available accelerator.

Measures the prover's dominant device kernel — coset LDE (blowup 2) +
Poseidon2-Merkle commitment — in trace cells/second, the per-chip figure of
merit from BASELINE.md ("proofs/sec and trace cells/sec/chip").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against this host's CPU running the identical pipeline
(the reference has no published absolute numbers; BASELINE.json.published={}).
"""

import json
import os
import subprocess
import sys
import time

LOG_N = int(os.environ.get("BENCH_LOG_N", "14"))
WIDTH = int(os.environ.get("BENCH_WIDTH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))


def run_bench() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persist compiled executables across invocations — but only for the
    # accelerator backend: XLA:CPU AOT blobs mis-deserialize on this host
    # (machine-feature mismatch) and the reloaded code can spin forever.
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/openvm_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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


def run_vm_prove_bench() -> dict:
    """Opt-in (BENCH_MODE=vm_prove): full VM proof of a fibonacci program.

    Proves a hand-assembled RV32IM fibonacci loop end-to-end (preflight ->
    tracegen -> 15-AIR STARK) on the default accelerator and reports
    proved insns/sec.
    """
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.test_vm_prove import build_fib_program, FIB_EXECUTORS
    from openvm_tpu.stark import FriParameters, StarkConfig
    from openvm_tpu.vm.machine import Rv32Config, VirtualMachine

    n_iters = int(os.environ.get("BENCH_VM_N", "2000"))
    exe = build_fib_program(n_iters)
    stark = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=33,
                                          proof_of_work_bits=16))
    vm = VirtualMachine(Rv32Config(stark=stark, executors=FIB_EXECUTORS))
    vm.keygen()
    t0 = time.time()
    proof, pre = vm.prove(exe)
    dt = time.time() - t0
    vm.verify(proof)
    return {"metric": "vm_proved_insns_per_sec",
            "value": round(pre.instret / dt, 1), "unit": "insn/s",
            "vs_baseline": 1.0}


def main():
    if os.environ.get("BENCH_MODE") == "vm_prove":
        print(json.dumps(run_vm_prove_bench()))
        return
    if os.environ.get("BENCH_BACKEND") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"cells_per_sec": run_bench()}))
        return

    tpu_cells = run_bench()

    cpu_cells = None
    try:
        env = dict(os.environ, BENCH_BACKEND="cpu",
                   BENCH_LOG_N=str(max(LOG_N - 2, 10)))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, timeout=600)
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_cells = json.loads(line)["cells_per_sec"]
    except Exception:
        pass

    vs = tpu_cells / cpu_cells if cpu_cells else 1.0
    print(json.dumps({
        "metric": "trace_commit_throughput",
        "value": round(tpu_cells, 1),
        "unit": "cells/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
