"""TOML VM config loading (reference SdkVmConfig / openvm.toml)."""

import tomllib

from openvm_tpu.vm_config import (NAMED_CURVES, NAMED_MODULI,
                                  config_from_dict, load_vm_config)

SAMPLE = """
[app_vm_config.rv32i]
[app_vm_config.rv32m]
[app_vm_config.io]
[app_vm_config.bigint]

[app_vm_config.modular]
supported_moduli = ["secp256k1", "0x7", "11"]

[app_vm_config.fp2]
supported_moduli = ["bn254"]

[app_vm_config.ecc]
supported_curves = ["secp256k1", { modulus = "0x17", a = 5 }]
"""


def test_config_from_toml(tmp_path):
    p = tmp_path / "openvm.toml"
    p.write_text(SAMPLE)
    cfg = load_vm_config(str(p))
    assert cfg.bigint
    assert "mul" in cfg.executors and "hintstore" in cfg.executors
    assert cfg.moduli == (NAMED_MODULI["secp256k1"], 7, 11)
    assert cfg.fp2 == (NAMED_MODULI["bn254"],)
    assert cfg.curves == (NAMED_CURVES["secp256k1"], (0x17, 5))


def test_config_defaults():
    cfg = config_from_dict({"app_vm_config": {}})
    assert not cfg.bigint and not cfg.moduli and not cfg.curves
    assert "alu" in cfg.executors  # full set when no rv32i section


def test_config_vm_builds():
    from openvm_tpu.vm.machine import VirtualMachine
    cfg = config_from_dict(tomllib.loads(SAMPLE))
    vm = VirtualMachine(cfg)
    names = {a.name for a in vm.airs}
    assert {"int256_alu", "modular_addsub_0", "fp2_muldiv_0",
            "sw_add_ne_0", "sw_double_1"} <= names
