"""SDK: the user-facing prove/execute surface.

Mirrors the reference's ``GenericSdk`` API (reference crates/sdk/src/lib.rs:
126-205: execute, prove, app_keygen, verify_app_proof) plus the aggregation
surface (agg_keygen / prove_leaf / prove_internal / aggregate / verify_root;
reference lib.rs:454-465).  Not covered: the halo2/EVM wrapper
(SURVEY.md section 2.16).
"""

from __future__ import annotations

import subprocess
import time
from dataclasses import dataclass

import numpy as np

from . import metrics
from .vm import Interpreter, VmExe, load_elf, transpile_elf
from .vm.machine import Rv32Config, VirtualMachine


@dataclass
class AppProvingKey:
    vm: VirtualMachine
    exe_commit: np.ndarray
    # committed executable: anchors pc_start + init-memory root at verify
    # time (reference folds these into compute_exe_commit)
    exe: VmExe = None


_BABYBEAR_P = 2013265921


def _digest_to_bn254_bytes(digest) -> bytes:
    """BabyBear 8-digest -> 32 big-endian bytes of the Bn254Fr element
    sum_i digest[i] * P^i (reference babybear_digest_to_bn254 +
    bn254_to_bytes, crates/sdk/src/commit.rs:137-159).  P^8 = 2^248 <
    Bn254Fr order, so no modular reduction occurs."""
    acc = 0
    for i, d in enumerate(digest):
        acc += int(d) * _BABYBEAR_P ** i
    return acc.to_bytes(32, "big")


def _bn254_bytes_to_digest(data: bytes) -> list:
    """Inverse: 32 big-endian bytes -> base-P digits, low digit first
    (reference bytes_to_u32_digest, commit.rs:161-178)."""
    acc = int.from_bytes(data, "big")
    out = []
    for _ in range(8):
        out.append(acc % _BABYBEAR_P)
        acc //= _BABYBEAR_P
    return out


@dataclass
class AppExecutionCommit:
    """The two 32-byte Bn254-compatible commitments a user checks against
    the final (EVM-facing) proof (reference AppExecutionCommit,
    crates/sdk/src/commit.rs:70-124):

      app_exe_commit = compress(compress(hash(app_program_commit),
                                         hash(init_memory_root)),
                                hash([pc_start, 0*7]))
      app_vm_commit  = the leaf verifier program commitment (it pins the
                       app VM config)

    each mapped to bytes as the Bn254Fr number sum_i digest[i] * P^i."""

    app_exe_commit: bytes  # 32 big-endian bytes
    app_vm_commit: bytes

    @staticmethod
    def compute(app_pk: "AppProvingKey", leaf_commit) -> \
            "AppExecutionCommit":
        from .vm import memory_tree as mt

        vm, exe = app_pk.vm, app_pk.exe
        init_root = [int(x) for x in vm.commit_init_memory(exe)]
        prog = [int(x) for x in np.asarray(app_pk.exe_commit,
                                           dtype=np.uint64)]
        pc_pad = [int(exe.pc_start)] + [0] * 7
        exe_digest = mt.compress(
            mt.compress(mt.hash_leaf(prog), mt.hash_leaf(init_root)),
            mt.hash_leaf(pc_pad))
        return AppExecutionCommit(
            app_exe_commit=_digest_to_bn254_bytes(exe_digest),
            app_vm_commit=_digest_to_bn254_bytes(
                [int(x) for x in np.asarray(leaf_commit,
                                            dtype=np.uint64)]))

    def exe_commit_digest(self) -> list:
        return _bn254_bytes_to_digest(self.app_exe_commit)

    def vm_commit_digest(self) -> list:
        return _bn254_bytes_to_digest(self.app_vm_commit)


@dataclass
class AppProof:
    proof: object
    exe_commit: np.ndarray
    user_public_values: list


class Sdk:
    """execute / keygen / prove / verify for RV32IM guest programs."""

    def __init__(self, config: Rv32Config | None = None):
        self.config = config or Rv32Config()

    # -- build / transpile ----------------------------------------------
    @staticmethod
    def transpile(elf_bytes: bytes) -> VmExe:
        return transpile_elf(load_elf(elf_bytes))

    # -- pure execution (reference Sdk::execute, lib.rs:345-364) ---------
    def execute(self, exe: VmExe, inputs=None, max_insns=None, native=True):
        t0 = time.time()
        st = None
        if native:
            try:
                from .vm.native import NativeInterpreter
                st = NativeInterpreter(exe).execute(inputs, max_insns)
                if st.error == "unsupported opcode":
                    # extension opcodes the C++ interpreter doesn't cover
                    st = None
                elif st.error:
                    raise RuntimeError(st.error)
            except (OSError, subprocess.CalledProcessError):
                st = None  # toolchain unavailable: python fallback
        if st is None:
            st = Interpreter(exe, moduli=self.config.moduli,
                             curves=self.config.curves,
                             fp2=self.config.fp2).execute(inputs, max_insns)
        dt = time.time() - t0
        metrics.gauge("execute_e1_time_ms", round(dt * 1000, 3))
        if dt > 0:
            metrics.gauge("execute_e1_insn_mi/s",
                          round(st.instret / dt / 1e6, 3))
        metrics.gauge("insns", st.instret)
        return st

    # -- keygen ----------------------------------------------------------
    def app_keygen(self, exe: VmExe) -> AppProvingKey:
        vm = VirtualMachine(self.config)
        vm.keygen()
        return AppProvingKey(vm=vm, exe_commit=vm.commit_exe(exe), exe=exe)

    # -- proving ---------------------------------------------------------
    def prove(self, app_pk: AppProvingKey, exe: VmExe, inputs=None,
              max_insns=None) -> AppProof:
        t_total = time.time()
        proof, pre = app_pk.vm.prove(exe, inputs, max_insns)
        metrics.gauge("total_proof_time_ms",
                      round((time.time() - t_total) * 1000, 3))
        metrics.gauge("insns", pre.instret)
        return AppProof(proof=proof, exe_commit=app_pk.exe_commit,
                        user_public_values=pre.public_values)

    # -- verification ----------------------------------------------------
    def verify_app_proof(self, app_pk: AppProvingKey, app_proof: AppProof):
        return app_pk.vm.verify(app_proof.proof,
                                expected_exe_commit=app_proof.exe_commit,
                                exe=app_pk.exe)

    # -- aggregation (reference AggStarkProver, crates/sdk/src/prover/agg.rs
    # 149-263: leaf layer over app segment proofs, internal layers k-ary
    # until one proof remains) --------------------------------------------
    def agg_keygen(self, app_pk: AppProvingKey, app_log_degrees,
                   num_children: int = 3, stark=None,
                   root_stark=None) -> "AggProvingKey":
        """Build the aggregation VM + leaf/internal programs for app proofs
        of the given (fixed) height profile.

        The native VM proves at a FIXED height profile (reference
        NATIVE_MAX_TRACE_HEIGHTS) derived statically from the programs'
        opcode histograms, so every leaf/internal proof shares one trace
        shape — one verifier-program shape serves every internal layer and
        one set of compiled prover kernels serves the whole tree.
        """
        from .native_compiler.verifier_program import (
            build_internal_program, build_leaf_program, build_root_program,
            static_height_profile)
        from .vm.machine import NativeConfig

        if stark is None:
            stark = app_pk.vm.config.stark
        vm = VirtualMachine(NativeConfig(stark=stark, num_native_pvs=44))
        vm.keygen()

        expose_mem = app_pk.vm.config.persistent
        leaf_exe, _ = build_leaf_program(app_pk.vm.pk.vk, app_log_degrees,
                                         expose_memory_pvs=expose_mem)
        heights = static_height_profile(leaf_exe)
        # fixed-point: the internal program's shape depends on the height
        # profile, which depends on the internal program's own histogram
        internal_exe = None
        for _ in range(4):
            log_degrees = self._native_log_degrees(vm, heights)
            internal_exe, _ = build_internal_program(vm.pk.vk, log_degrees,
                                                     num_children)
            h2 = static_height_profile(internal_exe, base_heights=heights)
            if h2 == heights:
                break
            heights = h2
        log_degrees = self._native_log_degrees(vm, heights)
        leaf_commit = vm.commit_exe(leaf_exe, heights["program"])
        internal_commit = vm.commit_exe(internal_exe, heights["program"])

        # root layer: a DISTINCT fixed-height config (reference RootSC,
        # crates/continuations/src/verifier/root/mod.rs + prover/root.rs:
        # default log_blowup 3, fixed air heights).  The root program pins
        # the (internal, leaf) commitment pair as immediates, terminating
        # the chain of trust in-circuit.
        if root_stark is None:
            from .stark import FriParameters, StarkConfig
            root_stark = StarkConfig(
                fri=FriParameters.standard_with_100_bits_conjectured_security(
                    3) if stark.fri.num_queries > 8 else
                FriParameters(log_blowup=3,
                              num_queries=stark.fri.num_queries,
                              proof_of_work_bits=stark.fri.proof_of_work_bits))
        root_vm = VirtualMachine(NativeConfig(stark=root_stark,
                                              num_native_pvs=28))
        root_vm.keygen()
        root_exe, _ = build_root_program(vm.pk.vk, log_degrees,
                                         internal_commit, leaf_commit)
        root_heights = static_height_profile(root_exe)

        return AggProvingKey(
            vm=vm, heights=heights,
            log_degrees=log_degrees,
            leaf_exe=leaf_exe, internal_exe=internal_exe,
            leaf_commit=leaf_commit,
            internal_commit=internal_commit,
            num_children=num_children,
            root_vm=root_vm, root_exe=root_exe, root_heights=root_heights,
            root_commit=root_vm.commit_exe(root_exe,
                                           root_heights["program"]))

    @staticmethod
    def _native_log_degrees(vm, heights):
        """Per-air log heights for the fixed profile, in air order."""
        lds = []
        for air in vm.airs:
            if air.name == "program":
                h = heights.get("program", 1)
            elif air.name == "connector":
                h = 2
            elif air.name == "native_public_values":
                h = 1 << (vm.config.num_native_pvs - 1).bit_length()
            elif air.name == "range_checker":
                h = len(air.preprocessed_trace())
            elif air.name == "bitwise_lookup":
                h = 1 << 16
            else:
                h = heights.get(air.name, 1)
            lds.append(max(int(h) - 1, 0).bit_length())
        return lds

    def prove_leaf(self, agg_pk: "AggProvingKey", app_pk: AppProvingKey,
                   app_proof) -> object:
        """Wrap one app segment proof in a leaf native-VM proof."""
        from .native_compiler.verifier_program import serialize_proof_felts
        hints = serialize_proof_felts(app_pk.vm.pk.vk, app_proof)
        proof, _ = agg_pk.vm.prove(agg_pk.leaf_exe, inputs=hints,
                                   fixed_heights=agg_pk.heights)
        return proof

    def prove_internal(self, agg_pk: "AggProvingKey",
                       child_proofs: list) -> object:
        """Aggregate num_children native-VM proofs into one."""
        from .native_compiler.verifier_program import serialize_proof_felts
        assert len(child_proofs) == agg_pk.num_children
        hints = [[int(v) for v in agg_pk.internal_commit],
                 [int(v) for v in agg_pk.leaf_commit]]
        for p in child_proofs:
            hints.extend(serialize_proof_felts(agg_pk.vm.pk.vk, p))
        proof, _ = agg_pk.vm.prove(agg_pk.internal_exe, inputs=hints,
                                   fixed_heights=agg_pk.heights)
        return proof

    def prove_root(self, agg_pk: "AggProvingKey", final_proof) -> object:
        """Re-prove the final aggregation proof on the ROOT VM (distinct
        fixed-height FRI profile — reference RootVerifierLocalProver,
        crates/sdk/src/prover/root.rs).  The root program pins the
        (internal, leaf) program commitments as immediates, so the
        resulting proof carries the whole chain of trust in one
        fixed-shape STARK."""
        from .native_compiler.verifier_program import serialize_proof_felts
        hints = serialize_proof_felts(agg_pk.vm.pk.vk, final_proof)
        proof, _ = agg_pk.root_vm.prove(agg_pk.root_exe, inputs=hints,
                                        fixed_heights=agg_pk.root_heights)
        # pin the EXACT height of every root AIR: profiled AIRs are padded
        # to exactly the profile (pad_to asserts <=); the remaining AIRs
        # (connector, range checkers, public values...) have structural,
        # witness-independent heights — record them so the root shape is
        # truly constant for a downstream SNARK wrapper (reference
        # keygen/mod.rs:452-462 pins air_heights from a dummy proof)
        for p in proof.per_air:
            name = agg_pk.root_vm.airs[p.air_id].name
            h = 1 << p.log_degree
            prev = agg_pk.root_heights.setdefault(name, h)
            assert prev == h, f"root air {name} height drifted {prev}->{h}"
        return proof

    def app_execution_commit(self, app_pk: AppProvingKey,
                             agg_pk: "AggProvingKey") -> AppExecutionCommit:
        """The Bn254-facing (app_exe_commit, app_vm_commit) pair a user
        checks against the final proof — the half of the halo2/EVM bridge
        the codec alone did not cover (reference commit.rs:70-124)."""
        return AppExecutionCommit.compute(app_pk, agg_pk.leaf_commit)

    def verify_root_proof(self, agg_pk: "AggProvingKey", root_proof,
                          expected_app_commit=None):
        """Verify a root-layer proof: STARK-verify on the root vk, pin the
        program commitment to the compiled root program, check the fixed
        height profile, and read out the aggregated claims.  All
        chain-of-trust checks below the root happened in-circuit."""
        from .stark.verifier import VerificationError

        res = agg_pk.root_vm.verify(root_proof, exe=agg_pk.root_exe)

        def _chk(cond, msg):
            if not cond:
                raise VerificationError(msg)

        got_commit = np.asarray(root_proof.commitments.main_trace[0],
                                dtype=np.uint64)
        _chk(np.array_equal(got_commit, agg_pk.root_commit),
             "not the root verifier program")
        # fixed root shape (reference root.rs air_heights check): EXACT
        # equality — profiled AIRs are padded to exactly the profile by
        # the prover; AIRs pinned by a previous prove_root on this key
        # (structural heights) must match too.  AIRs the local key has
        # never profiled nor pinned are absent only on a verify-only key
        # that has produced no root proof yet.
        for p in root_proof.per_air:
            name = agg_pk.root_vm.airs[p.air_id].name
            cap = agg_pk.root_heights.get(name)
            if cap is not None:
                _chk((1 << p.log_degree) == max(int(cap), 1),
                     f"root air {name} height {1 << p.log_degree} != "
                     f"fixed profile {cap}")
        pvs = [int(v) for v in res["public_values"]]
        _chk(pvs[10] == 0, f"aggregated exit code {pvs[10]}")
        _chk(pvs[11] == 1, "aggregated execution did not terminate")
        if expected_app_commit is not None:
            _chk(pvs[0:8] == [int(v) for v in expected_app_commit],
                 "app program commitment mismatch")
        return {"app_commit": pvs[0:8], "connector": pvs[8:12],
                "memory_pvs": pvs[12:28]}

    def verify_root(self, agg_pk: "AggProvingKey", root_proof,
                    expected_app_commit=None):
        """Host-side final check of an aggregated proof: STARK-verify on
        the native vk, pin the root program to the internal (or leaf)
        program commitment, and pin the exposed (self, leaf) commitment
        pair — closing the recursion chain of trust at every depth."""
        res = agg_pk.vm.verify(root_proof, exe=agg_pk.internal_exe)
        pvs = [int(v) for v in res["public_values"]]
        got_commit = np.asarray(root_proof.commitments.main_trace[0],
                                dtype=np.uint64)
        from .stark.verifier import VerificationError

        def _chk(cond, msg):
            if not cond:
                raise VerificationError(msg)

        if np.array_equal(got_commit, agg_pk.internal_commit):
            _chk(pvs[28:36] == [int(v) for v in agg_pk.internal_commit],
                 "root self-commit mismatch")
            _chk(pvs[36:44] == [int(v) for v in agg_pk.leaf_commit],
                 "root leaf-commit mismatch")
        else:
            _chk(np.array_equal(got_commit, agg_pk.leaf_commit),
                 "root proof is neither internal nor leaf program")
        _chk(pvs[10] == 0, f"aggregated exit code {pvs[10]}")
        _chk(pvs[11] == 1, "aggregated execution did not terminate")
        if expected_app_commit is not None:
            _chk(pvs[0:8] == [int(v) for v in expected_app_commit],
                 "app program commitment mismatch")
        return {"app_commit": pvs[0:8], "connector": pvs[8:12],
                "memory_pvs": pvs[12:28]}

    def aggregate(self, agg_pk: "AggProvingKey", app_pk: AppProvingKey,
                  segment_proofs: list) -> object:
        """Full tree: leaf-wrap every segment, then k-ary internal layers
        until one root proof remains (reference agg.rs:159-196)."""
        layer = [self.prove_leaf(agg_pk, app_pk, p)
                 for p in segment_proofs]
        k = agg_pk.num_children
        while len(layer) > 1:
            nxt = []
            for i in range(0, len(layer), k):
                group = layer[i:i + k]
                while len(group) < k:   # duplicate-last padding
                    group.append(group[-1])
                nxt.append(self.prove_internal(agg_pk, group))
            layer = nxt
        return layer[0]


@dataclass
class AggProvingKey:
    """Aggregation proving key (reference AggProvingKey, keygen/mod.rs)."""
    vm: VirtualMachine                 # native VM, 44 felt pvs
    heights: dict                      # fixed per-chip trace heights
    log_degrees: list                  # per-air log heights (air order)
    leaf_exe: VmExe
    internal_exe: VmExe
    leaf_commit: np.ndarray
    internal_commit: np.ndarray
    num_children: int = 3
    # root layer (reference RootVerifierProvingKey, keygen/mod.rs:452-462):
    # a distinct VM at the root FRI profile with its own fixed heights
    root_vm: VirtualMachine = None
    root_exe: VmExe = None
    root_heights: dict = None
    root_commit: np.ndarray = None
