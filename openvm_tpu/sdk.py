"""SDK: the user-facing prove/execute surface.

Mirrors the reference's ``GenericSdk`` API (reference crates/sdk/src/lib.rs:
126-205: execute, prove, app_keygen, verify_app_proof) minus the not-yet-
ported aggregation layers (SURVEY.md section 2.16).
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
