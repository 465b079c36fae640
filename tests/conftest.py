"""Test configuration: force CPU backend with 8 virtual devices.

Tests validate numerics and sharding without TPU hardware; bench.py runs on
the real chip.  Must run before jax initializes, hence env vars here.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (a tunneled TPU
# whose per-op round-trip latency is ruinous for eager tests).  Tests validate
# numerics/sharding on a local CPU mesh; bench.py uses the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache on CPU — XLA:CPU AOT
# executables deserialize with a machine-feature mismatch on this host and
# the reloaded code can spin forever at runtime.  (bench.py keeps its own
# cache for the TPU backend, whose executables round-trip fine.)
# x64 on CPU: field muls lower to ~10 HLO ops instead of the 16-bit-limb
# TPU path (4x faster compiles of the big constraint graphs).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
