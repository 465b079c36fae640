"""Keygen: AIR inventory -> multi-STARK proving/verifying keys.

Mirrors the reference's ``AirInventory::keygen -> MultiStarkProvingKey``
surface (SURVEY.md section 2.2: per-AIR vk.params.width, symbolic
constraints + interactions, preprocessed commits, trace-height constraints,
vkey pre_hash observed first in the transcript).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..field import babybear as bb
from .. import merkle, ntt, poseidon2 as p2
from .config import StarkConfig
from .logup import append_logup_constraints, chunk_interactions
from .symbolic import Air, AirBuilder, SymbolicDag


@dataclass
class AirWidths:
    preprocessed: int = 0
    cached_mains: tuple = ()
    common_main: int = 0
    after_challenge: int = 0  # in extension elements (m chunks + 1 cumsum)

    def main_widths(self):
        return list(self.cached_mains) + (
            [self.common_main] if self.common_main else [])


@dataclass
class AirVerifyingKey:
    name: str
    widths: AirWidths
    num_public_values: int
    num_exposed: int  # 0 or 1 (cumulative sum)
    log_quotient_degree: int
    dag: SymbolicDag
    interaction_chunks: list
    preprocessed_commit: Optional[np.ndarray] = None  # (8,) canonical digest

    @property
    def quotient_degree(self) -> int:
        return 1 << self.log_quotient_degree


@dataclass
class TraceHeightConstraint:
    """sum_i coefficients[i] * height_i < threshold."""

    coefficients: np.ndarray  # (num_airs,) uint64
    threshold: int
    is_threshold_at_p: bool = False


@dataclass
class MultiStarkVerifyingKey:
    config: StarkConfig
    per_air: list  # list[AirVerifyingKey]
    trace_height_constraints: list = field(default_factory=list)
    pre_hash: np.ndarray = None  # (8,) canonical

    @property
    def num_phases(self) -> int:
        return 1 if any(vk.widths.after_challenge for vk in self.per_air) else 0

    @property
    def num_challenges_to_sample(self):
        return [2] if self.num_phases else []


@dataclass
class AirProvingKey:
    vk: AirVerifyingKey
    air: Air
    preprocessed_lde: object = None  # committed device LDE (bitrev) or None
    preprocessed_tree: object = None
    preprocessed_trace: object = None  # natural-domain device matrix


@dataclass
class MultiStarkProvingKey:
    vk: MultiStarkVerifyingKey
    per_air: list  # list[AirProvingKey]


def _vk_pre_hash(per_air, config: StarkConfig, height_constraints) -> np.ndarray:
    """Poseidon2 sponge over a canonical serialization of the vkey."""
    items: list[int] = [
        config.fri.log_blowup, config.fri.num_queries,
        config.fri.proof_of_work_bits, config.log_up_pow_bits,
        len(per_air),
    ]
    for vk in per_air:
        items += [vk.widths.preprocessed, len(vk.widths.cached_mains),
                  *vk.widths.cached_mains, vk.widths.common_main,
                  vk.widths.after_challenge, vk.num_public_values,
                  vk.num_exposed, vk.log_quotient_degree]
        for node in vk.dag.nodes:
            for part in node:
                if isinstance(part, str):
                    items += [sum(part.encode())]
                else:
                    items += [int(part)]
        items += [len(vk.dag.constraint_roots), *vk.dag.constraint_roots]
        if vk.preprocessed_commit is not None:
            items += [int(x) for x in vk.preprocessed_commit]
    for c in height_constraints:
        items += [int(x) for x in c.coefficients] + [c.threshold % bb.P]

    host = p2.Poseidon2Host()
    state = np.zeros(16, dtype=np.uint64)
    vals = np.asarray([v % bb.P for v in items], dtype=np.uint64)
    for c0 in range(0, len(vals), p2.RATE):
        chunk = vals[c0:c0 + p2.RATE]
        state[:len(chunk)] = chunk
        state = host.permute(state)
    return state[:8].copy()


def keygen(airs: list[Air], config: StarkConfig = StarkConfig(),
           trace_height_constraints: list | None = None
           ) -> MultiStarkProvingKey:
    import jax.numpy as jnp

    from .. import ensure_cache_backend_ok
    ensure_cache_backend_ok()

    per_air_vk = []
    per_air_pk_data = []
    for air in airs:
        builder = AirBuilder(air)
        air.eval(builder)
        interactions = list(builder.interactions)
        chunks = chunk_interactions(interactions, config.max_constraint_degree)
        num_chunks = append_logup_constraints(builder,
                                              config.max_constraint_degree)
        dag = SymbolicDag.from_builder(builder)

        # quotient degree = 2^ceil(log2(max_deg - 1)) as in the reference
        max_deg = max(dag.max_degree(), 2)
        log_qd = math.ceil(math.log2(max(max_deg - 1, 1)))
        assert log_qd <= config.fri.log_blowup, (
            f"air {air.name}: constraint degree {max_deg} needs quotient "
            f"blowup {log_qd} > fri log_blowup {config.fri.log_blowup}")

        prep = air.preprocessed_trace()
        prep_commit = None
        prep_lde = prep_tree = prep_dev = None
        if prep is not None:
            prep = np.asarray(prep, dtype=np.uint64) % bb.P
            prep_dev = bb.to_monty(jnp.asarray(prep.astype(np.uint32)))
            prep_lde = ntt.coset_lde(prep_dev, config.fri.log_blowup)
            prep_tree = merkle.commit([prep_lde])
            prep_commit = prep_tree.root

        widths = AirWidths(
            preprocessed=0 if prep is None else int(prep.shape[1]),
            cached_mains=tuple(air.cached_main_widths),
            common_main=air.width,
            after_challenge=(num_chunks + 1) if interactions else 0,
        )
        vk = AirVerifyingKey(
            name=air.name,
            widths=widths,
            num_public_values=air.num_public_values,
            num_exposed=1 if interactions else 0,
            log_quotient_degree=log_qd,
            dag=dag,
            interaction_chunks=chunks,
            preprocessed_commit=prep_commit,
        )
        per_air_vk.append(vk)
        per_air_pk_data.append((prep_lde, prep_tree, prep_dev))

    height_constraints = list(trace_height_constraints or [])
    pre_hash = _vk_pre_hash(per_air_vk, config, height_constraints)
    mvk = MultiStarkVerifyingKey(config=config, per_air=per_air_vk,
                                 trace_height_constraints=height_constraints,
                                 pre_hash=pre_hash)
    per_air_pk = [
        AirProvingKey(vk=vk, air=air, preprocessed_lde=lde,
                      preprocessed_tree=tree, preprocessed_trace=dev)
        for vk, air, (lde, tree, dev) in zip(per_air_vk, airs, per_air_pk_data)
    ]
    return MultiStarkProvingKey(vk=mvk, per_air=per_air_pk)


# ---------------------------------------------------------------------------
# proving-key serialization (reference SDK fs.rs + CLI `setup` cache role)
# ---------------------------------------------------------------------------


def save_pk(pk: MultiStarkProvingKey, path: str) -> None:
    """Serialize a proving key to disk (device arrays -> host numpy)."""
    import pickle

    def tree_host(t):
        if t is None:
            return None
        return ([np.asarray(m) for m in t.matrices],
                [np.asarray(l) for l in t.digest_layers], t.root)

    payload = {
        "vk": pk.vk,
        "per_air": [
            {"air": apk.air,
             "lde": None if apk.preprocessed_lde is None
             else np.asarray(apk.preprocessed_lde),
             "tree": tree_host(apk.preprocessed_tree),
             "trace": None if apk.preprocessed_trace is None
             else np.asarray(apk.preprocessed_trace)}
            for apk in pk.per_air],
    }
    import os
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_pk(path: str) -> MultiStarkProvingKey:
    """Deserialize a proving key (host numpy -> device arrays)."""
    import pickle

    import jax.numpy as jnp

    with open(path, "rb") as f:
        payload = pickle.load(f)

    def tree_dev(t):
        if t is None:
            return None
        mats, layers, root = t
        return merkle.MerkleTree(
            matrices=[jnp.asarray(m) for m in mats],
            digest_layers=[jnp.asarray(l) for l in layers], root=root)

    per_air = [
        AirProvingKey(
            vk=vk, air=d["air"],
            preprocessed_lde=None if d["lde"] is None
            else jnp.asarray(d["lde"]),
            preprocessed_tree=tree_dev(d["tree"]),
            preprocessed_trace=None if d["trace"] is None
            else jnp.asarray(d["trace"]))
        for vk, d in zip(payload["vk"].per_air, payload["per_air"])]
    return MultiStarkProvingKey(vk=payload["vk"], per_air=per_air)


def _circuit_code_digest() -> str:
    """Hash of the circuit-defining sources: any constraint change must
    invalidate cached proving keys even when widths are unchanged."""
    import hashlib
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    paths = []
    for sub in ("vm/circuit", "stark"):
        d = os.path.join(root, sub)
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".py"):
                paths.append(os.path.join(d, fn))
    for p in paths:
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def cached_keygen(airs: list, config: StarkConfig,
                  cache_dir: str | None = None,
                  extra_sig: str = "") -> MultiStarkProvingKey:
    """keygen with a disk cache keyed on (air shapes, FRI config, circuit
    source digest) — the reference's `cargo openvm setup` artifact cache
    (~/.openvm) role.  Set OPENVM_TPU_NO_PK_CACHE=1 to disable."""
    import hashlib
    import os

    if os.environ.get("OPENVM_TPU_NO_PK_CACHE"):
        return keygen(airs, config)
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "openvm_tpu_pk")
    sig = repr([(a.name, a.width, tuple(a.cached_main_widths),
                 a.num_public_values) for a in airs])
    sig += repr((config.fri.log_blowup, config.fri.num_queries,
                 config.fri.proof_of_work_bits, config.log_up_pow_bits,
                 config.max_constraint_degree))
    sig += _circuit_code_digest() + extra_sig
    key = hashlib.sha256(sig.encode()).hexdigest()[:24]
    path = os.path.join(cache_dir, f"pk_{key}.pkl")
    if os.path.exists(path):
        try:
            return load_pk(path)
        except Exception:
            pass  # corrupt/stale cache: regenerate
    pk = keygen(airs, config)
    try:
        save_pk(pk, path)
    except Exception:
        pass
    return pk
