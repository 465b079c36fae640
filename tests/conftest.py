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
# the reloaded code can spin forever or MISCOMPUTE at runtime (openvm_tpu's
# __init__ now only turns the cache on for the TPU backend).
# NOTE: do NOT enable jax_enable_x64 — this XLA:CPU build miscompiles u64
# integer chains nondeterministically (same jitted fn, same input, different
# results across calls); it silently corrupted proofs in round 2.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
