"""End-to-end multi-trace STARK: prove on device, verify on host.

Mirrors the reference's `air_test` recipe (SURVEY.md section 4): keygen ->
tracegen -> prove -> verify, plus negative tests (tampered trace must fail).
"""

import numpy as np
import pytest

from openvm_tpu.stark import (Air, AirProvingContext, FriParameters,
                              StarkConfig, VerificationError, keygen, prove,
                              verify)

P = 2013265921
TEST_CONFIG = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=4,
                                            proof_of_work_bits=2))


class FibonacciAir(Air):
    """a' = b, b' = a + b; pvs [a0, b0, b_last]."""

    name = "fib"
    width = 2
    num_public_values = 3

    def eval(self, b):
        a, bcol = b.main(0), b.main(1)
        a_n, b_n = b.main(0, offset=1), b.main(1, offset=1)
        with b.when_first_row():
            b.assert_eq(a, b.public_value(0))
            b.assert_eq(bcol, b.public_value(1))
        with b.when_transition():
            b.assert_eq(a_n, bcol)
            b.assert_eq(b_n, a + bcol)
        with b.when_last_row():
            b.assert_eq(bcol, b.public_value(2))


def fib_trace(n):
    rows = np.zeros((n, 2), dtype=np.uint64)
    a, b = 0, 1
    for i in range(n):
        rows[i] = (a, b)
        a, b = b, (a + b) % P
    return rows


class SenderAir(Air):
    """Sends each row's value to bus 7 with count 1."""

    name = "sender"
    width = 1

    def eval(self, b):
        b.push_send(7, [b.main(0)], 1)


class ReceiverAir(Air):
    """Lookup table: receives value with multiplicity column."""

    name = "receiver"
    width = 2  # value, multiplicity

    def eval(self, b):
        b.push_receive(7, [b.main(0)], b.main(1))


def test_fibonacci_prove_verify():
    air = FibonacciAir()
    pk = keygen([air], TEST_CONFIG)
    n = 16
    trace = fib_trace(n)
    pvs = [0, 1, int(trace[-1, 1])]
    proof = prove(pk, [AirProvingContext(air_id=0, common_main=trace,
                                         public_values=pvs)])
    verify(pk.vk, proof)

    # codec roundtrip: decoded proof verifies too
    from openvm_tpu.stark.codec import decode_proof, encode_proof
    blob = encode_proof(proof)
    proof2 = decode_proof(blob)
    verify(pk.vk, proof2)
    assert encode_proof(proof2) == blob


def test_fibonacci_wrong_public_value_fails():
    air = FibonacciAir()
    pk = keygen([air], TEST_CONFIG)
    trace = fib_trace(16)
    pvs = [0, 1, (int(trace[-1, 1]) + 1) % P]
    with pytest.raises((VerificationError, AssertionError)):
        proof = prove(pk, [AirProvingContext(air_id=0, common_main=trace,
                                             public_values=pvs)])
        verify(pk.vk, proof)


def test_logup_two_airs():
    sender, receiver = SenderAir(), ReceiverAir()
    pk = keygen([sender, receiver], TEST_CONFIG)
    send_vals = np.array([3, 5, 5, 7, 3, 3, 9, 11], dtype=np.uint64)
    table = np.zeros((4, 2), dtype=np.uint64)
    table[:, 0] = [3, 5, 7, 9]
    # multiplicities must match sends: 3 appears 3x, 5 2x, 7 1x, 9 1x, 11 !!
    send_vals[-1] = 9  # make it balance: 9 appears 2x
    table[:, 1] = [3, 2, 1, 2]
    proof = prove(pk, [
        AirProvingContext(air_id=0, common_main=send_vals[:, None]),
        AirProvingContext(air_id=1, common_main=table),
    ])
    verify(pk.vk, proof)


def test_logup_unbalanced_fails():
    sender, receiver = SenderAir(), ReceiverAir()
    pk = keygen([sender, receiver], TEST_CONFIG)
    send_vals = np.array([3, 5, 5, 7], dtype=np.uint64)
    table = np.zeros((4, 2), dtype=np.uint64)
    table[:, 0] = [3, 5, 7, 9]
    table[:, 1] = [1, 2, 1, 5]  # 9 never sent but multiplicity 5
    with pytest.raises((VerificationError, AssertionError)):
        proof = prove(pk, [
            AirProvingContext(air_id=0, common_main=send_vals[:, None]),
            AirProvingContext(air_id=1, common_main=table),
        ])
        verify(pk.vk, proof)


def test_mixed_heights_multi_air():
    fib = FibonacciAir()
    sender, receiver = SenderAir(), ReceiverAir()
    pk = keygen([fib, sender, receiver], TEST_CONFIG)
    trace = fib_trace(32)
    pvs = [0, 1, int(trace[-1, 1])]
    send_vals = np.array([2, 2, 4, 8], dtype=np.uint64)
    table = np.zeros((8, 2), dtype=np.uint64)
    table[:, 0] = [2, 4, 8, 16, 1, 1, 1, 1]
    table[:, 1] = [2, 1, 1, 0, 0, 0, 0, 0]
    proof = prove(pk, [
        AirProvingContext(air_id=0, common_main=trace, public_values=pvs),
        AirProvingContext(air_id=1, common_main=send_vals[:, None]),
        AirProvingContext(air_id=2, common_main=table),
    ])
    verify(pk.vk, proof)
