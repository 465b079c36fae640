"""Multi-trace STARK proof system (BabyBear + FRI + LogUp), TPU-native.

The L1 layer of the framework (SURVEY.md section 2.2): the equivalent of the
reference's external ``powdr-labs/stark-backend`` crate, re-designed for TPU.
"""

from .config import FriParameters, StarkConfig, baby_bear_poseidon2_config
from .keygen import keygen, MultiStarkProvingKey, MultiStarkVerifyingKey
from .prover import AirProvingContext, Proof, prove
from .symbolic import Air, AirBuilder
from .verifier import VerificationError, verify

__all__ = [
    "Air", "AirBuilder", "AirProvingContext", "FriParameters", "Proof",
    "StarkConfig", "VerificationError", "baby_bear_poseidon2_config",
    "keygen", "prove", "verify", "MultiStarkProvingKey",
    "MultiStarkVerifyingKey",
]
