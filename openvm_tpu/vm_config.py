"""TOML-driven VM configuration (reference SdkVmConfig).

Re-design of the reference's `SdkVmConfig` modular TOML config
(reference crates/sdk/src/config/global.rs:79-100 and per-guest
`openvm.toml`, SURVEY.md section 2.16): each `[app_vm_config.<ext>]`
section enables one extension.

    [app_vm_config.rv32i]
    [app_vm_config.rv32m]
    [app_vm_config.io]
    [app_vm_config.bigint]

    [app_vm_config.modular]
    supported_moduli = ["0xffff...fc2f"]        # ints, hex or named below

    [app_vm_config.fp2]
    supported_moduli = ["bn254"]

    [app_vm_config.ecc]
    supported_curves = ["secp256k1"]            # or {modulus=..., a=...}

Named moduli/curves: secp256k1, p256, bn254, bls12_381.
"""

from __future__ import annotations

import tomllib

from .vm.machine import FULL_EXECUTORS, Rv32Config

NAMED_MODULI = {
    "secp256k1": (1 << 256) - (1 << 32) - 977,
    "p256": (1 << 256) - (1 << 224) + (1 << 192) + (1 << 96) - 1,
    "bn254": 21888242871839275222246405745257275088696311157297823662689037894645226208583,
    "bls12_381": 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
}

# (modulus, a) for y^2 = x^3 + a*x + b
NAMED_CURVES = {
    "secp256k1": (NAMED_MODULI["secp256k1"], 0),
    "p256": (NAMED_MODULI["p256"], NAMED_MODULI["p256"] - 3),
    "bn254": (NAMED_MODULI["bn254"], 0),
}


def _to_int(v) -> int:
    if isinstance(v, int):
        return v
    s = str(v).strip().lower()
    if s in NAMED_MODULI:
        return NAMED_MODULI[s]
    return int(s, 16 if s.startswith("0x") else 10)


def _to_curve(v):
    if isinstance(v, str):
        key = v.strip().lower()
        if key not in NAMED_CURVES:
            raise ValueError(f"unknown curve {v!r}; known: "
                             f"{sorted(NAMED_CURVES)}")
        return NAMED_CURVES[key]
    if isinstance(v, dict):
        return (_to_int(v["modulus"]), _to_int(v.get("a", 0)))
    raise ValueError(f"bad curve spec {v!r}")


def config_from_dict(doc: dict) -> Rv32Config:
    app = doc.get("app_vm_config", doc)
    kw: dict = {}
    # rv32i/rv32m/io sections select executor families
    if any(k in app for k in ("rv32i", "rv32m", "io")):
        ex: tuple = ()
        if "rv32i" in app:
            ex += ("alu", "lt", "beq", "blt", "jal_lui", "jalr", "auipc",
                   "loadstore", "shift")
        if "rv32m" in app:
            ex += ("mul", "divrem")
        if "io" in app:
            ex += ("hintstore",)
        kw["executors"] = ex
    else:
        kw["executors"] = FULL_EXECUTORS
    if "bigint" in app:
        kw["bigint"] = True
    if "keccak" in app:
        kw["keccak"] = True
    if "sha256" in app:
        kw["sha256"] = True
    if "native" in app:
        kw["native"] = True
    if "modular" in app:
        kw["moduli"] = tuple(_to_int(m) for m in
                             app["modular"].get("supported_moduli", []))
    if "fp2" in app:
        kw["fp2"] = tuple(_to_int(m) for m in
                          app["fp2"].get("supported_moduli", []))
    if "ecc" in app:
        kw["curves"] = tuple(_to_curve(c) for c in
                             app["ecc"].get("supported_curves", []))
    sys_cfg = app.get("system", {})
    if "num_public_values" in sys_cfg:
        kw["num_pv_words"] = int(sys_cfg["num_public_values"]) // 4
    if sys_cfg.get("continuations"):
        kw["persistent"] = True
    # [fri_params] — reference AppConfig.app_fri_params
    # (crates/sdk/src/config/mod.rs:34-101)
    fri_cfg = doc.get("fri_params", doc.get("app_fri_params", {}))
    if fri_cfg:
        from .stark import FriParameters, StarkConfig
        kw["stark"] = StarkConfig(fri=FriParameters(
            log_blowup=int(fri_cfg.get("log_blowup", 1)),
            num_queries=int(fri_cfg.get("num_queries", 84)),
            proof_of_work_bits=int(fri_cfg.get("proof_of_work_bits", 16))))
    return Rv32Config(**kw)


def load_vm_config(path: str) -> Rv32Config:
    with open(path, "rb") as f:
        return config_from_dict(tomllib.load(f))
