"""openvm_tpu: a TPU-native zkVM proving framework.

A from-scratch re-design of the capabilities of powdr-labs/openvm (a modular
zkVM proving RISC-V guest programs with a multi-AIR STARK system) for TPU
hardware: JAX/XLA/Pallas for all per-row/per-column compute (field arithmetic,
NTT/LDE, Poseidon2/Merkle commitment, LogUp, quotient, FRI), host code for the
inherently serial parts (interpreters, Fiat-Shamir challenger), and
jax.sharding meshes for multi-chip scale-out.

Layer map (mirrors reference SURVEY.md section 1):
  field/    BabyBear + quartic extension (L1 substrate)
  ntt, poseidon2, merkle, fri, challenger   commitment pipeline (L1)
  stark/    multi-trace STARK prover/verifier + symbolic AIRs (L1)
  vm/       VM framework: instructions, transpiler, interpreters, chips (L0-L4)
  parallel/ mesh sharding of the prover
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: prover/keygen graphs for a given VM
# config + trace-height profile compile once per machine, not once per
# process (the reference's analog is cargo's build cache for its kernels).
# TPU backend ONLY: XLA:CPU AOT executables reload with a machine-feature
# mismatch on this host and then miscompute silently (round-2 postmortem —
# a cache written by a different machine corrupted proofs and commitments).
# Opt out with OPENVM_TPU_NO_CACHE=1.
import os as _os

if (not _os.environ.get("OPENVM_TPU_NO_CACHE")
        and _os.environ.get("JAX_PLATFORMS", "").lower() not in ("cpu",)):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "OPENVM_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "openvm_tpu_xla"))
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # Cache EVERY compile: the prover's cost profile is ~100 small (1-5s)
    # compiles per cold prove, not a few big ones — with the default 1s
    # floor most of them were re-paid by every process (round-5 profiling:
    # the logup phase cost ~260s in compile on BOTH a cold and a
    # disk-cache-warm process).  Reads are ~0.1s/entry.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def ensure_cache_backend_ok():
    """Runtime backstop for the env-var gate above: if jax actually
    resolved to the CPU backend (e.g. the platform was forced via
    jax.config AFTER import, so JAX_PLATFORMS never said "cpu"), turn the
    persistent cache off before any compilation is reused.  Called from
    keygen/prove entry points."""
    import jax as _jax2

    if (_jax2.config.jax_compilation_cache_dir
            and _jax2.default_backend() == "cpu"):
        _jax2.config.update("jax_compilation_cache_dir", None)
