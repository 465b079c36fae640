"""Poseidon2 AIR chip: tracegen vs host permutation + prove/verify."""

import numpy as np
import pytest

from openvm_tpu import poseidon2 as p2
from openvm_tpu.stark import (AirProvingContext, FriParameters, StarkConfig,
                              keygen, prove, verify)
from openvm_tpu.stark.symbolic import Air
from openvm_tpu.vm.circuit.poseidon2_chip import POSEIDON2_BUS, Poseidon2Air

TEST_CONFIG = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                            proof_of_work_bits=1))


def test_trace_matches_host_permutation(rng):
    air = Poseidon2Air()
    inputs = rng.integers(0, p2.P, size=(4, 16), dtype=np.uint64)
    t = air.trace(inputs, mults=np.zeros(4, dtype=np.uint64))
    host = p2.Poseidon2Host()
    out = t[:4, air.output_cols()]
    for i in range(4):
        np.testing.assert_array_equal(out[i], host.permute(inputs[i]))


class _Requester(Air):
    """Sends one (input || output) request per valid row."""

    name = "poseidon2_requester"
    width = 33  # is_valid, in16, out16

    def eval(self, b):
        v = b.main(0)
        msg = [b.main(1 + i) for i in range(32)]
        b.assert_bool(v)
        b.push_send(POSEIDON2_BUS, msg, v)


@pytest.mark.skipif(not __import__("os").environ.get("OPENVM_SLOW"),
                    reason="slow crypto prove; set OPENVM_SLOW=1")
def test_prove_verify_with_requester(rng):
    p2air = Poseidon2Air()
    req = _Requester()
    pk = keygen([p2air, req], TEST_CONFIG)

    inputs = rng.integers(0, p2.P, size=(2, 16), dtype=np.uint64)
    chip_trace = p2air.trace(inputs)  # mult=1 rows
    out = chip_trace[:2, p2air.output_cols()]
    req_trace = np.zeros((2, 33), dtype=np.uint64)
    req_trace[:, 0] = 1
    req_trace[:, 1:17] = inputs
    req_trace[:, 17:33] = out
    proof = prove(pk, [
        AirProvingContext(air_id=0, common_main=chip_trace),
        AirProvingContext(air_id=1, common_main=req_trace),
    ])
    verify(pk.vk, proof)


def test_corrupted_permutation_fails_debug(rng):
    from openvm_tpu.stark.debug import check_constraints
    p2air = Poseidon2Air()
    pk = keygen([p2air], TEST_CONFIG)
    inputs = rng.integers(0, p2.P, size=(2, 16), dtype=np.uint64)
    t = p2air.trace(inputs, mults=np.zeros(2, dtype=np.uint64))
    t[0, p2air.output_cols()][0]  # no-op read
    t[0, t.shape[1] - 1] = (t[0, t.shape[1] - 1] + 1) % p2.P  # corrupt
    fails = check_constraints(
        pk, [AirProvingContext(air_id=0, common_main=t)],
        raise_on_error=False)
    assert fails, "corrupted trace must fail the constraint debugger"
