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
