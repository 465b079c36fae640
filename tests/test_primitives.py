"""Circuit-primitive tests: RangeTupleChecker and Encoder.

Mirrors reference crates/circuits/primitives/src/{range_tuple,encoder}
tests (SURVEY.md section 2.13): standalone AIR bundles proved end-to-end
plus tampered-witness negatives via the constraint debugger.
"""

import numpy as np
import pytest

from openvm_tpu.stark import (Air, AirProvingContext, FriParameters,
                              StarkConfig, keygen, prove, verify)
from openvm_tpu.stark.debug import check_constraints
from openvm_tpu.vm.circuit import buses as B
from openvm_tpu.vm.circuit.encoder import Encoder
from openvm_tpu.vm.circuit.system import RangeTupleCheckerAir

P = 2013265921
TEST_CONFIG = StarkConfig(fri=FriParameters(log_blowup=1, num_queries=2,
                                            proof_of_work_bits=1))
SIZES = (8, 16)


class TupleSenderAir(Air):
    """Sends (x, y) tuple range checks with count 1 per valid row."""

    name = "tuple_sender"
    width = 3  # is_valid, x, y

    def eval(self, b):
        v, x, y = b.main(0), b.main(1), b.main(2)
        b.assert_bool(v)
        B.range_tuple_check(b, x, y, v)


def _tuple_bundle(pairs):
    checker = RangeTupleCheckerAir(SIZES)
    sender = TupleSenderAir()
    n = 1 << max(len(pairs) - 1, 0).bit_length()
    st = np.zeros((max(n, 1), 3), dtype=np.uint64)
    for i, (x, y) in enumerate(pairs):
        st[i] = (1, x, y)
    mult = np.zeros((SIZES[0] * SIZES[1], 1), dtype=np.uint64)
    for (x, y) in pairs:
        mult[x * SIZES[1] + y, 0] += 1
    return checker, sender, st, mult


def test_range_tuple_prove_verify():
    pairs = [(0, 0), (7, 15), (3, 9), (3, 9)]
    checker, sender, st, mult = _tuple_bundle(pairs)
    pk = keygen([checker, sender], TEST_CONFIG)
    ctxs = [AirProvingContext(air_id=0, common_main=mult),
            AirProvingContext(air_id=1, common_main=st)]
    check_constraints(pk, ctxs)
    proof = prove(pk, ctxs)
    verify(pk.vk, proof)


def test_range_tuple_out_of_range_fails():
    # y = 16 is outside sizes (8, 16): no table row backs the lookup
    pairs = [(2, 16)]
    checker, sender, st, mult = _tuple_bundle([])
    st[0] = (1, 2, 16)
    pk = keygen([checker, sender], TEST_CONFIG)
    ctxs = [AirProvingContext(air_id=0, common_main=mult),
            AirProvingContext(air_id=1, common_main=st)]
    with pytest.raises(AssertionError, match="unbalanced"):
        check_constraints(pk, ctxs)


def test_range_tuple_forged_multiplicity_fails():
    pairs = [(1, 2)]
    checker, sender, st, mult = _tuple_bundle(pairs)
    mult[1 * SIZES[1] + 2, 0] += 1  # one receive too many
    pk = keygen([checker, sender], TEST_CONFIG)
    ctxs = [AirProvingContext(air_id=0, common_main=mult),
            AirProvingContext(air_id=1, common_main=st)]
    with pytest.raises(AssertionError, match="unbalanced"):
        check_constraints(pk, ctxs)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

FLAG_CNT = 5
ENC = Encoder(FLAG_CNT, max_degree=2)


class EncodedFlagsAir(Air):
    """Five mutually-exclusive operations selected by 2 encoder vars
    (one-hot would spend 5 boolean columns): out = flag_i * (i + 1) * x."""

    name = "encflags"
    width = ENC.width + 2  # vars..., x, out

    def eval(self, b):
        vars_ = [b.main(i) for i in range(ENC.width)]
        x = b.main(ENC.width)
        out = b.main(ENC.width + 1)
        ENC.eval(b, vars_)
        flags = ENC.flags(vars_)
        acc = 0
        for i, f in enumerate(flags):
            acc = acc + f * (i + 1) * x
        # every flag expression vanishes at the invalid (zero) point, so
        # this also forces out = 0 on dummy rows; degree 3
        b.assert_zero(out - acc)


def _enc_trace(rows):
    """rows: list of (flag_idx | None, x)."""
    n = 1 << max(len(rows) - 1, 0).bit_length()
    t = np.zeros((max(n, 1), ENC.width + 2), dtype=np.uint64)
    for r, (fi, x) in enumerate(rows):
        if fi is None:
            continue
        t[r, :ENC.width] = ENC.flag_pt(fi)
        t[r, ENC.width] = x
        t[r, ENC.width + 1] = (fi + 1) * x % P
    return t


def test_encoder_points_are_distinct_and_valid():
    assert ENC.width == 2  # C(2+2, 2) = 6 >= 5 + invalid
    pts = [tuple(ENC.flag_pt(i)) for i in range(FLAG_CNT)]
    assert len(set(pts)) == FLAG_CNT
    assert all(sum(p) <= 2 for p in pts)
    assert (0, 0) not in pts  # reserved for invalid rows


def test_encoder_prove_verify():
    air = EncodedFlagsAir()
    pk = keygen([air], TEST_CONFIG)
    t = _enc_trace([(0, 7), (3, 11), (4, 2), (None, 0)])
    ctxs = [AirProvingContext(air_id=0, common_main=t)]
    check_constraints(pk, ctxs)
    proof = prove(pk, ctxs)
    verify(pk.vk, proof)


def test_encoder_rejects_unused_point():
    air = EncodedFlagsAir()
    pk = keygen([air], TEST_CONFIG)
    t = _enc_trace([(0, 7)])
    # the 6th point (5 flags + invalid = 6 used of 6) — forge coordinates
    # that are a valid solution point but not an assigned flag: with
    # exactly 6 points all are used, so instead forge an out-of-range var
    t[0, 0] = 3  # var > max_degree
    ctxs = [AirProvingContext(air_id=0, common_main=t)]
    with pytest.raises(AssertionError):
        check_constraints(pk, ctxs)


def test_encoder_wrong_flag_value_fails():
    air = EncodedFlagsAir()
    pk = keygen([air], TEST_CONFIG)
    t = _enc_trace([(2, 5)])
    t[0, ENC.width + 1] = (2 + 1) * 5 + 1  # wrong out
    ctxs = [AirProvingContext(air_id=0, common_main=t)]
    with pytest.raises(AssertionError):
        check_constraints(pk, ctxs)
