"""VirtualMachine: config, keygen, prove, verify.

The L4 glue (reference crates/vm/src/arch/vm.rs VirtualMachine /
VmExecutor / verify_single): assembles the system + RV32IM AIR set, runs
preflight execution, builds all traces (vectorized numpy -> device), derives
every lookup-table multiplicity by evaluating the interaction DAGs over the
built traces (generically — tracegen can never desync from the AIRs), and
drives the L1 STARK prover.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import metrics
from ..field import babybear as bb
from ..stark import (AirProvingContext, StarkConfig, keygen as stark_keygen,
                     prove as stark_prove, verify as stark_verify)
from ..stark.verifier import VerificationError
from ..stark.evaluator import DeviceOps
from .. import merkle, ntt
from .circuit import buses as B
from .circuit.rv32im import (AuipcAir, BaseAluAir, BranchEqAir, BranchLtAir,
                             JalLuiAir, JalrAir, LessThanAir, LoadStoreAir,
                             DivRemAir, HintStoreAir, MulAir, ShiftAir,
                             _pad_pow2)
from .circuit.system import (BitwiseLookupAir, ConnectorAir, PhantomAir,
                             ProgramAir, PublicValuesAir, RangeCheckerAir,
                             VolatileBoundaryAir, connector_trace,
                             program_cached_trace)
from .preflight import PreflightInterpreter
from .instructions import VmExe

P = 2013265921


def _check(cond, msg):
    if not cond:
        raise VerificationError(msg)


FULL_EXECUTORS = ("alu", "lt", "beq", "blt", "jal_lui", "jalr", "auipc",
                  "loadstore", "shift", "mul", "divrem", "hintstore")


@dataclass
class Rv32Config:
    num_pv_words: int = 8
    stark: StarkConfig = None
    # executor chip families to include (reference VmConfig's modular
    # extension list, config.rs:60-103); tests can use a reduced set
    executors: tuple = FULL_EXECUTORS
    # enable the Int256 (bigint) extension chips (reference
    # extensions/bigint, SURVEY.md section 2.8)
    bigint: bool = False
    # keccak256 extension (reference extensions/keccak256, SURVEY.md 2.6)
    keccak: bool = False
    # sha256 extension (reference extensions/sha256, SURVEY.md 2.7)
    sha256: bool = False
    # modular-arithmetic (algebra) extension: one chip trio per modulus
    # (reference ModularExtension{supported_moduli}, SURVEY.md section 2.9)
    moduli: tuple = ()
    # ECC extension: (modulus, a_coeff) per short-Weierstrass curve
    # (reference WeierstrassExtension{supported_curves}, SURVEY.md 2.10)
    curves: tuple = ()
    # Fp2 (complex extension field) moduli (reference Fp2Extension)
    fp2: tuple = ()
    # persistent memory: Merkle-committed memory state (continuations mode,
    # reference SystemConfig.continuation_enabled)
    persistent: bool = False
    # native (recursion) VM: felt-granular AS-4 memory, native extension
    # chips, felt public values (reference NativeConfig,
    # extensions/native/circuit/src/extension/mod.rs:89-167)
    native: bool = False
    # felt public values for the native VM (reference VmVerifierPvs sizing)
    num_native_pvs: int = 16

    def __post_init__(self):
        if self.stark is None:
            # default = reference's standard_with_100_bits_conjectured_
            # security(1) (crates/sdk/src/config/mod.rs:130-141): 84 queries
            # + 16 PoW bits at blowup 2.  Tests pass explicit weak profiles.
            from ..stark import FriParameters
            self.stark = StarkConfig(
                fri=FriParameters.standard_with_100_bits_conjectured_security(
                    1))


_EXECUTOR_AIRS = {
    "alu": BaseAluAir, "lt": LessThanAir, "beq": BranchEqAir,
    "blt": BranchLtAir, "jal_lui": JalLuiAir, "jalr": JalrAir,
    "auipc": AuipcAir, "loadstore": LoadStoreAir, "shift": ShiftAir,
    "mul": MulAir, "divrem": DivRemAir, "hintstore": HintStoreAir,
}


def _register_int256():
    from .circuit.bigint import INT256_AIRS
    _EXECUTOR_AIRS.update(INT256_AIRS)


def _register_keccak():
    from .circuit.keccak import KECCAK_AIRS
    _EXECUTOR_AIRS.update(KECCAK_AIRS)
    from .circuit.sha256 import SHA256_AIRS
    _EXECUTOR_AIRS.update(SHA256_AIRS)


_register_int256()
_register_keccak()

INT256_EXECUTORS = ("int256_alu", "int256_lt", "int256_mul", "int256_beq",
                    "int256_blt", "int256_shift")

KECCAK_EXECUTORS = ("keccak_sponge", "keccakf")

SHA256_EXECUTORS = ("sha256_sponge", "sha256")

NATIVE_EXECUTORS = ("native_field_arithmetic", "native_field_extension",
                    "native_branch_eq", "native_loadstore",
                    "native_loadstore4", "native_jal_rangecheck",
                    "native_poseidon2", "fri_reduced_opening",
                    "verify_batch", "verify_batch_inside")


def NativeConfig(stark: StarkConfig = None, num_native_pvs: int = 16):
    """VM config for the native (recursion) VM — native chips only
    (reference NativeConfig::aggregation, extension/mod.rs:557-569)."""
    return Rv32Config(stark=stark, native=True, executors=NATIVE_EXECUTORS,
                      num_native_pvs=num_native_pvs)


class VirtualMachine:
    def __init__(self, config: Rv32Config | None = None):
        self.config = config or Rv32Config()
        if self.config.native:
            from .circuit.native import NATIVE_AIRS, NativePublicValuesAir
            from .circuit.poseidon2_chip import Poseidon2Air
            system = [
                ProgramAir(), ConnectorAir(),
                NativePublicValuesAir(self.config.num_native_pvs),
                VolatileBoundaryAir(), Poseidon2Air(), RangeCheckerAir(),
                BitwiseLookupAir(), PhantomAir(),
            ]
            for name, ctor in NATIVE_AIRS.items():
                if name not in _EXECUTOR_AIRS:
                    _EXECUTOR_AIRS[name] = ctor
        elif self.config.persistent:
            from .circuit.merkle_chip import MemoryMerkleAir
            from .circuit.persistent_boundary import PersistentBoundaryAir
            from .circuit.poseidon2_chip import Poseidon2Air
            system = [
                ProgramAir(), ConnectorAir(), PersistentBoundaryAir(),
                MemoryMerkleAir(), Poseidon2Air(), RangeCheckerAir(),
                BitwiseLookupAir(), PhantomAir(),
            ]
        else:
            system = [
                ProgramAir(), ConnectorAir(),
                PublicValuesAir(self.config.num_pv_words),
                VolatileBoundaryAir(), RangeCheckerAir(),
                BitwiseLookupAir(), PhantomAir(),
            ]
        self.NUM_SYSTEM_AIRS = len(system)
        executors = tuple(self.config.executors)
        if self.config.bigint:
            executors += tuple(n for n in INT256_EXECUTORS
                               if n not in executors)
        if self.config.keccak:
            executors += tuple(n for n in KECCAK_EXECUTORS
                               if n not in executors)
        if self.config.sha256:
            executors += tuple(n for n in SHA256_EXECUTORS
                               if n not in executors)
        self.airs = system + [_EXECUTOR_AIRS[name]() for name in executors]
        if "mul" in executors:
            # mul chips check (product limb, carry) pairs via the tuple
            # table (reference Rv32M periphery, extension/mod.rs:484-487)
            from .circuit.system import RangeTupleCheckerAir
            self.airs.append(RangeTupleCheckerAir())
        if self.config.moduli:
            from .circuit.modular import modular_airs
            self.airs += list(modular_airs(self.config.moduli).values())
        if self.config.curves:
            from .circuit.ecc import ecc_airs
            self.airs += list(ecc_airs(self.config.curves).values())
        if self.config.fp2:
            from .circuit.fp2 import fp2_airs
            self.airs += list(fp2_airs(self.config.fp2).values())
        self.air_index = {a.name: i for i, a in enumerate(self.airs)}
        self.pk = None

    def keygen(self, cache: bool = True):
        """Build (or load from the disk cache) the multi-STARK proving key
        (reference `cargo openvm setup` artifact cache role)."""
        if cache:
            from ..stark.keygen import cached_keygen
            cfg = self.config
            extra = repr((cfg.executors, cfg.bigint, cfg.keccak, cfg.sha256,
                          cfg.moduli, cfg.curves, cfg.fp2, cfg.persistent,
                          cfg.native, cfg.num_native_pvs, cfg.num_pv_words))
            self.pk = cached_keygen(self.airs, self.config.stark,
                                    extra_sig=extra)
        else:
            self.pk = stark_keygen(self.airs, self.config.stark)
        return self.pk

    # -- commitment of the executable (program ROM cached trace) ---------
    def commit_exe(self, exe: VmExe, height: int | None = None) -> np.ndarray:
        import jax.numpy as jnp
        cached = program_cached_trace(exe.program, height)
        dev = bb.to_monty(jnp.asarray(cached.astype(np.uint32)))
        lde = ntt.coset_lde(dev, self.config.stark.fri.log_blowup)
        return merkle.commit([lde]).root

    # -- preflight plumbing (hybrid C++/Python core) ----------------------
    def _new_handle(self, exe: VmExe):
        """NativeVmHandle for the hybrid preflight: C++ executes RV32IM
        runs and yields extension opcodes to Python.  None when the C++
        toolchain is unavailable, or for the native (recursion) VM whose
        AS-4 felt memory model lives in Python."""
        if self.config.native:
            return None
        try:
            from .native import NativeVmHandle
            return NativeVmHandle(exe)
        except (OSError, ImportError) as ex:
            import subprocess
            if isinstance(ex, subprocess.CalledProcessError):
                raise
            return None

    def _interp(self, exe: VmExe) -> PreflightInterpreter:
        return PreflightInterpreter(
            exe, (self.config.num_native_pvs if self.config.native
                  else self.config.num_pv_words),
            moduli=self.config.moduli, curves=self.config.curves,
            fp2=self.config.fp2)

    def _segment_ctx(self, nvm, limits: dict | None = None):
        """Install metered segmentation thresholds on the handle and build
        the Python-side extension accounting (reference SegmentationLimits
        defaults, segment_ctx.rs:6-10; the powdr fork's
        POWDR_OPENVM_SEGMENT_DELTA timestamp-pressure knob is honored)."""
        import os as _os
        from .preflight import SegmentCtx
        assert self.pk is not None, "segmentation needs keygen() heights"
        max_log = self.config.stark.fri.max_log_trace_height
        cap = 1 << max_log
        defaults = {
            "max_height": cap - 10000 if cap > 20000 else cap,
            "max_cells": 2_000_000_000,
            "max_interactions": P,
            "check_insns": 1000,
        }
        defaults.update(limits or {})
        widths = {a.name: a.width for a in self.airs}
        inters = {a.name: len(self.pk.vk.per_air[i].dag.interactions)
                  for i, a in enumerate(self.airs)}
        ts_delta = int(_os.environ.get("POWDR_OPENVM_SEGMENT_DELTA", -1))
        # per-touched-word trace pressure: one boundary row per word plus
        # merkle path rows (amortized estimate; paths share prefixes)
        tw = widths.get("persistent_boundary", 0) \
            + 4 * widths.get("memory_merkle", 0)
        ti = inters.get("persistent_boundary", 0) \
            + 4 * inters.get("memory_merkle", 0)
        nvm.set_limits(max_height=defaults["max_height"],
                       max_cells=defaults["max_cells"],
                       max_interactions=defaults["max_interactions"],
                       ts_delta=ts_delta,
                       check_insns=defaults["check_insns"],
                       widths=widths, inters=inters,
                       touched_width=tw, touched_inters=ti)
        return SegmentCtx(widths=widths, inters=inters)

    # -- metered execution (E2 role: trace-height accounting) ------------
    def execute_metered(self, exe: VmExe, inputs=None, max_insns=None):
        """Count-only execution returning per-chip trace heights.

        The reference's metered mode (SURVEY.md section 2.1 "execution
        modes") sizes traces and picks segment boundaries.  On the hybrid
        core the C++ chips allocate NO record buffers (count-only rows,
        reference metered execution's height counters)."""
        nvm = self._new_handle(exe)
        if nvm is not None:
            nvm.set_mode(True)
        pre = self._interp(exe).execute(inputs, max_insns, nvm=nvm)
        heights = {}
        for air in self.airs[self.NUM_SYSTEM_AIRS:]:
            rec = pre.records.get(air.name)
            n = len(next(iter(rec.values()))) if rec else 1
            heights[air.name] = 1 << max((n - 1).bit_length(), 0)
        max_h = self.config.stark.fri.max_log_trace_height
        fits = all(h <= (1 << max_h) for h in heights.values())
        return {"instret": pre.instret, "chip_heights": heights,
                "exit_code": pre.exit_code,
                "fits_single_segment": fits,
                "total_cells": sum(
                    h * a.width for a, h in
                    zip(self.airs[self.NUM_SYSTEM_AIRS:], heights.values()))}

    # -- persistent-memory system traces --------------------------------
    def _initial_tree(self, exe: VmExe):
        from .memory_tree import SparseMemoryTree
        tree = SparseMemoryTree()
        words: dict = {}
        for (a_s, addr), byte in exe.init_memory.items():
            w = words.setdefault((a_s, addr // 4), [0, 0, 0, 0])
            w[addr % 4] = byte
        for (a_s, wa), data in words.items():
            tree.write_word(a_s, wa, data)
        return tree, words

    def _persistent_traces(self, traces, pre, exe,
                           initial_tree=None) -> list:
        """Build persistent boundary + merkle + poseidon2 traces; returns
        the merkle AIR public values [initial_root || final_root]."""
        from .memory_tree import hash_leaf, leaf_index
        if initial_tree is not None:
            tree, init_words_img = initial_tree
        else:
            tree, init_words_img = self._initial_tree(exe)

        def init_word(a_s, wa):
            if (a_s, wa) in pre.init_words:
                return list(pre.init_words[(a_s, wa)])
            return list(init_words_img.get((a_s, wa), [0, 0, 0, 0]))

        touched = {k: v for k, v in pre.touched.items() if k[0] in (1, 2, 3)}
        leaves = sorted({(a_s, wa // 2) for (a_s, wa) in touched})
        leaf_rows = []
        leaf_updates = {}
        for (a_s, li) in leaves:
            init_cells = init_word(a_s, 2 * li) + init_word(a_s, 2 * li + 1)
            final_cells = list(init_cells)
            fts = [0, 0]
            for k in range(2):
                w = touched.get((a_s, 2 * li + k))
                if w:
                    final_cells[4 * k:4 * k + 4] = w[:4]
                    fts[k] = w[4]
            leaf_rows.append({"as": a_s, "leaf": li,
                              "init": init_cells, "final": final_cells,
                              "fts0": fts[0], "fts1": fts[1]})
            leaf_updates[leaf_index(a_s, 2 * li)] = (
                hash_leaf(init_cells), hash_leaf(final_cells))

        boundary_air = self.airs[self.air_index["persistent_boundary"]]
        merkle_air = self.airs[self.air_index["memory_merkle"]]
        p2_air = self.airs[self.air_index["poseidon2"]]

        btrace = boundary_air.trace(leaf_rows)
        mtrace, init_root, final_root = merkle_air.trace(leaf_updates, tree)
        requests = np.concatenate([boundary_air.p2_requests(btrace),
                                   merkle_air.p2_requests(mtrace)], axis=0)
        traces["persistent_boundary"] = btrace
        traces["memory_merkle"] = mtrace
        traces["poseidon2"] = p2_air.trace(requests)

        # stash the final tree for pv extraction by callers
        for (a_s, wa), w in touched.items():
            tree.write_word(a_s, wa, w[:4])
        pre.final_memory_tree = tree
        return [int(x) for x in init_root] + [int(x) for x in final_root]

    # -- proving ---------------------------------------------------------
    def prove(self, exe: VmExe, inputs=None, max_insns=None, debug=False,
              native=True, state=None, initial_tree=None,
              fixed_heights: dict | None = None, nvm=None, seg_ctx=None,
              heights_only: bool = False):
        assert self.pk is not None, "call keygen() first"
        import os as _os
        import time as _time
        _t0 = [_time.time()]
        _timing = _os.environ.get("OPENVM_TPU_TIMING")

        def _mark(stage):
            if _timing:
                now = _time.time()
                print(f"[vm.prove] {stage}: {now - _t0[0]:.1f}s", flush=True)
                _t0[0] = now

        if native and nvm is None and state is None:
            nvm = self._new_handle(exe)
        if nvm is not None:
            nvm.set_mode(False)
        pre = self._interp(exe).execute(inputs, max_insns, state=state,
                                        nvm=nvm, seg_ctx=seg_ctx)
        _mark("execute (preflight)")

        traces: dict[str, np.ndarray] = {}
        # program: cached [pc|opcode|operands], common [mult]
        cached = program_cached_trace(
            exe.program,
            fixed_heights.get("program") if fixed_heights else None)
        mult = np.zeros((len(cached), 1), dtype=np.uint64)
        for idx, cnt in pre.exec_counts.items():
            mult[idx, 0] = cnt
        # the connector's end row fetches the TERMINATE instruction when the
        # segment terminates (soundness: final_pc must hold TERMINATE)
        if pre.exit_code is not None:
            t_idx = (pre.final_pc - exe.program.pc_base) // exe.program.step
            mult[t_idx, 0] += 1
        traces["program"] = mult
        program_cached = cached

        suspended = pre.exit_code is None
        initial_pc = state["pc"] if state is not None else exe.pc_start
        traces["connector"] = connector_trace(
            initial_pc, pre.final_pc, pre.final_ts,
            42 if suspended else pre.exit_code, 0 if suspended else 1)

        merkle_pvs = None
        if self.config.persistent:
            merkle_pvs = self._persistent_traces(traces, pre, exe,
                                                 initial_tree=initial_tree)
        elif self.config.native:
            pv_air = self.airs[self.air_index["native_public_values"]]
            traces["native_public_values"] = pv_air.trace(pre.touched)
            bnd = sorted((k, v) for k, v in pre.touched.items()
                         if k[0] in (1, 2, 4))
            brows = np.zeros((max(len(bnd), 1),
                              self.airs[self.air_index["memory_boundary"]]
                              .width), dtype=np.uint64)
            for r, ((a_s, wa), w) in enumerate(bnd):
                init = pre.init_words[(a_s, wa)]
                brows[r, 0] = 1
                brows[r, 1] = a_s
                brows[r, 2] = wa
                brows[r, 3:7] = init
                brows[r, 7:11] = w[:4]
                brows[r, 11] = w[4]
            keys = [a_s * (1 << 27) + wa for ((a_s, wa), _) in bnd]
            for r in range(len(bnd) - 1):
                dk = keys[r + 1] - keys[r] - 1
                brows[r, 12] = dk & 0x7FFF
                brows[r, 13] = dk >> 15
                brows[r, 14] = 1
            traces["memory_boundary"] = _pad_pow2(brows)
            # shared poseidon2 chip: requests from the native adapter and
            # the verify_batch top/inside rows (assembled after the
            # executor-chip loop below so their traces exist)
            self._pending_native_p2 = True
        else:
            # public values air: data + final ts per word
            npv = self.config.num_pv_words
            pvt = np.zeros((npv, self.airs[self.air_index["public_values"]].width), dtype=np.uint64)
            for i in range(npv):
                w = pre.touched.get((3, i))
                if w:
                    pvt[i, :4] = w[:4]
                    pvt[i, 4] = w[4]
            traces["public_values"] = pvt

            # boundary: touched words in AS 1 and 2, sorted by key
            entries = sorted((k, v) for k, v in pre.touched.items()
                             if k[0] in (1, 2))
            brows = np.zeros((max(len(entries), 1),
                              self.airs[self.air_index["memory_boundary"]]
                              .width), dtype=np.uint64)
            for r, ((a_s, wa), w) in enumerate(entries):
                init = pre.init_words[(a_s, wa)]
                brows[r, 0] = 1
                brows[r, 1] = a_s
                brows[r, 2] = wa
                brows[r, 3:7] = init
                brows[r, 7:11] = w[:4]
                brows[r, 11] = w[4]
            keys = [a_s * (1 << 27) + wa for ((a_s, wa), _) in entries]
            for r in range(len(entries) - 1):
                d = keys[r + 1] - keys[r] - 1
                brows[r, 12] = d & 0x7FFF
                brows[r, 13] = d >> 15
                brows[r, 14] = 1  # has_next_valid
            traces["memory_boundary"] = _pad_pow2(brows)

        # phantom
        ph = pre.records.get("phantom")
        if ph:
            n = len(ph["pc"])
            pt = np.zeros((n, self.airs[self.air_index["phantom"]].width), dtype=np.uint64)
            pt[:, 0] = 1
            pt[:, 1] = ph["pc"]
            pt[:, 2] = ph["ts"]
            pt[:, 3] = ph["a"]
            pt[:, 4] = ph["b"]
            pt[:, 5] = ph["c"]
            traces["phantom"] = _pad_pow2(pt)
        else:
            traces["phantom"] = np.zeros((1, self.airs[self.air_index["phantom"]].width),
                                         dtype=np.uint64)

        # executor chips
        for name in pre.records:
            if name != "phantom" and name not in self.air_index:
                raise RuntimeError(
                    f"program uses {name} but the VM config excludes it")
        for air in self.airs[self.NUM_SYSTEM_AIRS:]:
            rec = pre.records.get(air.name)
            if rec:
                traces[air.name] = air.trace(rec)
            else:
                traces[air.name] = np.zeros((1, air.width), dtype=np.uint64)

        if getattr(self, "_pending_native_p2", False):
            self._pending_native_p2 = False
            p2_air = self.airs[self.air_index["poseidon2"]]
            reqs = []
            p2rec = pre.records.get("native_poseidon2")
            if p2rec and len(p2rec["pc"]):
                reqs.append(np.asarray(p2rec["inp"], dtype=np.uint64))
            for name in ("verify_batch", "verify_batch_inside"):
                if name in self.air_index and pre.records.get(name):
                    air = self.airs[self.air_index[name]]
                    reqs.append(air.p2_requests(traces[name]))
            requests = (np.concatenate(reqs, axis=0) if reqs
                        else np.zeros((0, 16), dtype=np.uint64))
            traces["poseidon2"] = p2_air.trace(requests)

        # fixed-height padding (reference NATIVE_MAX_TRACE_HEIGHTS role):
        # pins every trace shape so aggregation-VM proofs share one shape
        # and one set of compiled prover kernels
        if fixed_heights:
            for name, h in fixed_heights.items():
                if name in traces:
                    air = self.airs[self.air_index[name]]
                    traces[name] = air.pad_to(traces[name], h)

        if heights_only:
            # pass-1 of uniform-shape continuations: per-chip (pow2)
            # trace heights only, no lookup eval / commit / prove
            heights = {name: len(tr) for name, tr in traces.items()}
            heights["program"] = len(program_cached)
            return heights, pre

        _mark("tracegen")
        # lookup multiplicities from the interaction DAGs (generic)
        range_mult, bitwise_mult, tuple_mult = self._lookup_multiplicities(
            traces, program_cached)
        traces["range_checker"] = range_mult
        traces["bitwise_lookup"] = bitwise_mult
        if "range_tuple" in self.air_index:
            traces["range_tuple"] = tuple_mult
        _mark("lookup multiplicities")

        return self._assemble_and_prove(traces, pre, exe, program_cached,
                                        merkle_pvs, debug, state)

    def _assemble_and_prove(self, traces, pre, exe, program_cached,
                            merkle_pvs, debug, state=None):
        # per-AIR trace attribution (reference perf-metrics `rows_used` +
        # main_cells_used counters, arch/vm.rs:1376-1398)
        main_cells = 0
        for air in self.airs:
            t = traces[air.name]
            rows = int(len(t))
            metrics.gauge("rows_used", rows, air=air.name)
            main_cells += rows * air.width
        metrics.gauge("main_cells_used", main_cells)

        ctxs = []
        for i, air in enumerate(self.airs):
            kwargs = dict(air_id=i, common_main=traces[air.name])
            if air.name == "program":
                kwargs["cached_mains"] = [program_cached]
            if air.name == "connector":
                suspended = pre.exit_code is None
                kwargs["public_values"] = [
                    state["pc"] if state is not None else exe.pc_start,
                    pre.final_pc, 42 if suspended else pre.exit_code,
                    0 if suspended else 1]
            if air.name == "public_values":
                kwargs["public_values"] = list(pre.public_values)
            if air.name == "native_public_values":
                kwargs["public_values"] = [
                    (pre.touched.get((3, i)) or [0])[0]
                    for i in range(self.config.num_native_pvs)]
            if air.name == "memory_merkle" and merkle_pvs is not None:
                kwargs["public_values"] = merkle_pvs
            ctxs.append(AirProvingContext(**kwargs))

        if debug:
            from ..stark.debug import check_constraints
            check_constraints(self.pk, ctxs)

        proof = stark_prove(self.pk, ctxs)
        return proof, pre

    def _lookup_multiplicities(self, traces, program_cached):
        """Evaluate every AIR's RANGE/BITWISE/TUPLE sends over its built
        trace, histogramming ON DEVICE (one jit per AIR shape; see
        stark.evaluator.jit_dag_lookup_hist).  The previous host path
        (stacked column transfer + np.add.at) cost 6.9s of a 21.5s warm
        prove at the 450k-insn workload — hundreds of MB of device->host
        traffic per AIR at 2^19 rows; this transfers three table-sized
        arrays once."""
        import jax
        import jax.numpy as jnp

        from ..stark.evaluator import jit_dag_lookup_hist

        range_air: RangeCheckerAir = self.airs[self.air_index["range_checker"]]
        range_h = len(range_air.preprocessed_trace())
        tuple_air = None
        tuple_sizes = ()
        if "range_tuple" in self.air_index:
            tuple_air = self.airs[self.air_index["range_tuple"]]
            tuple_sizes = tuple(tuple_air.sizes)

        kind_of = {B.RANGE_BUS: "range", B.BITWISE_BUS: "bitwise",
                   B.RANGE_TUPLE_BUS: "tuple"}
        rh_acc = bh_acc = th_acc = None
        for i, air in enumerate(self.airs):
            vk = self.pk.vk.per_air[i]
            dag = vk.dag
            sends = [(kind_of[bus], frs, cr) for (bus, frs, cr, is_send)
                     in dag.interactions
                     if is_send and bus in kind_of]
            if not sends:
                continue
            trace = traces[air.name]
            n = len(trace)
            dev = bb.to_monty(jnp.asarray((trace % P).astype(np.uint32)))
            env = {
                "main": ([bb.to_monty(jnp.asarray(
                    (program_cached % P).astype(np.uint32))), dev]
                    if air.name == "program" else [dev]),
                "preprocessed": self.pk.per_air[i].preprocessed_trace,
                "perm": None,
                "publics": jnp.zeros((64,), jnp.uint32),
                "challenges": jnp.zeros((2, 4), jnp.uint32),
                "exposed": jnp.zeros((1, 4), jnp.uint32),
                "sels": {
                    "is_first_row": bb.zeros((n,)),
                    "is_last_row": bb.zeros((n,)),
                    "is_transition": bb.zeros((n,)),
                },
                "next_step": 1,
            }
            rh, bh, th = jit_dag_lookup_hist(dag, env, sends, n, range_h,
                                             tuple_sizes)
            rh_acc = rh if rh_acc is None else rh_acc + rh
            bh_acc = bh if bh_acc is None else bh_acc + bh
            th_acc = th if th_acc is None else th_acc + th

        if rh_acc is None:
            range_mult = np.zeros(range_h, dtype=np.uint64)
            bitwise_mult = np.zeros((1 << 16, 2), dtype=np.uint64)
            tuple_mult = (np.zeros(tuple_sizes[0] * tuple_sizes[1],
                                   dtype=np.uint64) if tuple_air else None)
        else:
            rh_h, bh_h, th_h = jax.device_get((rh_acc, bh_acc, th_acc))
            range_mult = np.asarray(rh_h, dtype=np.uint64)
            bitwise_mult = np.asarray(bh_h, dtype=np.uint64).reshape(-1, 2)
            tuple_mult = (np.asarray(th_h, dtype=np.uint64)
                          if tuple_air else None)
        return (range_mult[:, None], bitwise_mult,
                None if tuple_mult is None else tuple_mult[:, None])

    # -- continuations ---------------------------------------------------
    def _segment_sweep(self, exe, inputs, max_insns_per_segment,
                       segment_limits, debug, fixed_heights, heights_only,
                       on_segment):
        """Shared continuation loop (reference VmInstance::
        prove_continuations, arch/vm.rs:966-1021).  One NativeVmHandle
        spans all segments: memory persists in C++; records/touched state
        reset per segment.  `on_segment(result, pre)` collects either
        proofs or height dicts."""
        tree, words = self._initial_tree(exe)
        nvm = self._new_handle(exe)
        seg_ctx = None
        if nvm is not None:
            seg_ctx = self._segment_ctx(nvm, segment_limits)
        elif max_insns_per_segment is None:
            max_insns_per_segment = 1 << 20  # python fallback: insn budget
        state = None
        while True:
            result, pre = self.prove(
                exe, inputs=inputs if state is None else None,
                max_insns=max_insns_per_segment, state=state,
                initial_tree=(tree, dict(words)), native=nvm is not None,
                nvm=nvm, seg_ctx=seg_ctx, debug=debug,
                fixed_heights=fixed_heights, heights_only=heights_only)
            on_segment(result, pre)
            for k, w in pre.touched.items():
                words[k] = list(w[:4])
            if pre.exit_code is not None:
                return pre.final_memory_tree
            state = pre.suspended_state
            tree = pre.final_memory_tree
            if nvm is not None:
                nvm.segment_reset()
            else:
                words = state["memory_words"]

    def segment_height_profile(self, exe: VmExe, inputs=None,
                               max_insns_per_segment: int | None = None,
                               segment_limits: dict | None = None) -> dict:
        """Per-chip max (pow2) trace heights across ALL segments of an
        execution — the app-VM analog of the reference's fixed aggregation
        heights (NATIVE_MAX_TRACE_HEIGHTS).  Proving every segment padded
        to this profile gives all segment proofs ONE shape: a single leaf
        verifier program serves every segment (shape-robust aggregation)
        and a single set of compiled prover kernels serves every segment
        (compile-once on TPU)."""
        profile: dict = {}

        def collect(heights, _pre):
            for k, h in heights.items():
                profile[k] = max(profile.get(k, 1), int(h))

        self._segment_sweep(exe, inputs, max_insns_per_segment,
                            segment_limits, False, None, True, collect)
        return profile

    def prove_continuations(self, exe: VmExe, inputs=None,
                            max_insns_per_segment: int | None = None,
                            segment_limits: dict | None = None,
                            debug=False, fixed_heights: dict | None = None,
                            uniform_shapes: bool = False):
        """Segmented proving (persistent mode): run until a metered
        segmentation limit trips (live trace-height / cells / interactions
        accounting, reference segment_ctx.rs:135-217) or the optional
        instruction budget, carry VmState, chain (pc, memory-root) across
        segments (reference VmInstance::prove_continuations,
        arch/vm.rs:966-1021).

        uniform_shapes=True first sweeps all segments heights-only
        (execute + tracegen, no proving), derives the per-chip max
        profile, then proves every segment padded to it — all segment
        proofs share one shape (see segment_height_profile).
        """
        assert self.config.persistent, "continuations need persistent mode"
        if uniform_shapes and fixed_heights is None:
            fixed_heights = self.segment_height_profile(
                exe, inputs, max_insns_per_segment, segment_limits)
        proofs = []
        tree = self._segment_sweep(
            exe, inputs, max_insns_per_segment, segment_limits, debug,
            fixed_heights, False, lambda proof, pre: proofs.append(proof))
        return proofs, tree

    def verify_segments(self, proofs, exe: VmExe,
                        expected_exe_commit=None):
        """Chain checks across segment proofs (reference verify_segments,
        arch/vm.rs:1107-1237): per-segment STARK validity, program-commit
        equality, pc chaining, memory-root chaining, suspend/terminate
        discipline.  Returns the final root for pv extraction.

        All checks raise VerificationError (never bare assert, which
        vanishes under ``python -O``)."""
        if not proofs:
            raise VerificationError("no segment proofs")
        prev_conn = prev_mk = None
        init_root = [int(x) for x in self.commit_init_memory(exe)]
        for i, proof in enumerate(proofs):
            stark_verify(self.pk.vk, proof)
            _check([p.air_id for p in proof.per_air] == list(
                range(len(self.airs))), "missing AIRs")
            if expected_exe_commit is not None:
                got = np.asarray(proof.commitments.main_trace[0],
                                 dtype=np.uint64)
                _check(np.array_equal(
                    got, np.asarray(expected_exe_commit, dtype=np.uint64)),
                    "program commitment mismatch")
            conn = proof.per_air[self.air_index["connector"]].public_values
            mk = proof.per_air[self.air_index["memory_merkle"]].public_values
            if i == 0:
                _check(conn[0] == exe.pc_start, "wrong entry pc")
                _check(list(mk[:8]) == init_root,
                       "wrong initial memory root")
            else:
                _check(prev_conn[1] == conn[0], "pc chain broken")
                _check(list(prev_mk[8:]) == list(mk[:8]),
                       "memory root chain broken")
            last = i == len(proofs) - 1
            if last:
                _check(conn[3] == 1, "final segment did not terminate")
                _check(conn[2] == 0, f"exit code {conn[2]}")
            else:
                _check(conn[3] == 0 and conn[2] == 42,
                       "non-final segment must suspend with exit code 42")
            prev_conn, prev_mk = conn, mk
        return {"final_root": list(prev_mk[8:]),
                "num_segments": len(proofs)}

    # -- verification ----------------------------------------------------
    def verify(self, proof, expected_exe_commit=None, exe: VmExe = None):
        """Verify a single (terminating) proof.

        In persistent mode pass ``exe`` so the proof's initial memory root
        and entry pc are anchored to the executable — without the anchor a
        proof over forged initial memory verifies (reference folds the
        init-memory root and pc_start into the exe commit,
        compute_exe_commit, crates/vm/src/system/program/trace.rs:96-152).
        """
        stark_verify(self.pk.vk, proof)
        # all airs must be present, in order
        _check([p.air_id for p in proof.per_air] == list(
            range(len(self.airs))), "missing AIRs")
        conn = proof.per_air[self.air_index["connector"]]
        _check(conn.public_values[3] == 1, "program did not terminate")
        _check(conn.public_values[2] == 0,
               f"exit code {conn.public_values[2]}")
        if expected_exe_commit is not None:
            got = np.asarray(proof.commitments.main_trace[0],
                             dtype=np.uint64)
            _check(np.array_equal(got, np.asarray(expected_exe_commit,
                                                  dtype=np.uint64)),
                   "program commitment mismatch")
        if exe is not None:
            _check(conn.public_values[0] == exe.pc_start, "wrong entry pc")
        result = {
            "initial_pc": conn.public_values[0],
            "final_pc": conn.public_values[1],
        }
        if self.config.persistent:
            mk = proof.per_air[self.air_index["memory_merkle"]]
            if exe is not None:
                init_root = [int(x) for x in self.commit_init_memory(exe)]
                _check(list(mk.public_values[:8]) == init_root,
                       "wrong initial memory root")
            result["initial_root"] = mk.public_values[:8]
            result["final_root"] = mk.public_values[8:]
        else:
            pv_name = ("native_public_values" if self.config.native
                       else "public_values")
            pv_air = proof.per_air[self.air_index[pv_name]]
            result["public_values"] = pv_air.public_values
        return result

    def commit_init_memory(self, exe: VmExe) -> np.ndarray:
        """Initial-memory Merkle root (persistent mode): the verifier-side
        anchor that a proof's initial_root must equal (reference
        compute_exe_commit's init-memory root component)."""
        tree, _ = self._initial_tree(exe)
        return tree.root()
