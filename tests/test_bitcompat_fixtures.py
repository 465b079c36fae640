"""Hash/transcript-layer fixture pinning (BITCOMPAT.md).

Pins the Poseidon2 permutation, sponge, compression, Merkle root, and
DuplexChallenger outputs to stored vectors, so any drift in the layers
that determine proof bytes is caught immediately.  The vectors are
self-derived today (Grain-LFSR round constants re-derived with the
reference's procedure — zkhash RC16 values are unavailable offline, see
BITCOMPAT.md); when reference vectors become available, replace these
constants and the whole stack re-anchors via `set_round_constants`.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from openvm_tpu import merkle, poseidon2 as p2  # noqa: E402
from openvm_tpu.challenger import DuplexChallenger  # noqa: E402
from openvm_tpu.field import babybear as bb  # noqa: E402

PERM_0_15 = [1952993082, 1617884793, 90683999, 1056283110,
             867545409, 290768337, 1606559591, 1225374373,
             1789096927, 494560864, 1094240052, 1575300684,
             540591577, 1767075193, 341504408, 1747000221]

HASH_ROWS_0 = [792144724, 998142365, 1110522868, 131779120,
               85566828, 51797263, 1511264494, 935419835]

MERKLE_ROOT = [512692767, 1522905392, 880658602, 995090898,
               1116979930, 1561754655, 1474458837, 453321358]


def test_grain_round_constants_head():
    # Grain LFSR (prime field, sbox=0, n=31, t=16, R_F=8, R_P=13) — the
    # parametrization behind zkhash RC16 (reference babybear.rs:1-45)
    assert [int(x) for x in p2._RC_ALL[0][:4]] == \
        [1774958255, 1185780729, 1621102414, 1796380621]
    assert p2._RC_ALL.shape == (8 + 13, 16)


def test_permutation_vector():
    st = bb.to_monty(jnp.asarray(np.arange(16, dtype=np.uint32)))
    out = np.asarray(bb.from_monty(p2.permute(st)))
    assert [int(x) for x in out] == PERM_0_15


def test_compress_is_truncated_permutation():
    left = bb.to_monty(jnp.asarray(np.arange(8, dtype=np.uint32)
                                   .reshape(1, 8)))
    right = bb.to_monty(jnp.asarray(np.arange(8, 16, dtype=np.uint32)
                                    .reshape(1, 8)))
    out = np.asarray(bb.from_monty(p2.compress_pairs(left, right)))[0]
    assert [int(x) for x in out] == PERM_0_15[:8]


def test_hash_rows_vector():
    m = bb.to_monty(jnp.asarray(
        (np.arange(4 * 12, dtype=np.uint32).reshape(4, 12) * 7 + 3) % bb.P))
    out = np.asarray(bb.from_monty(p2.hash_rows(m)))[0]
    assert [int(x) for x in out] == HASH_ROWS_0


def test_merkle_root_vector():
    tr = bb.to_monty(jnp.asarray(
        (np.arange(8 * 4, dtype=np.uint32).reshape(8, 4) * 11 + 1) % bb.P))
    root = np.asarray(bb.from_monty(merkle.commit_layers([tr])[-1][0]))
    assert [int(x) for x in root] == MERKLE_ROOT


def test_challenger_vectors():
    ch = DuplexChallenger()
    ch.observe_slice(list(range(8)))
    assert [ch.sample() for _ in range(3)] == \
        [536986157, 1951342121, 635888807]
    assert ch.sample_bits(20) == 870614
    ch2 = DuplexChallenger()
    ch2.observe_ext((1, 2, 3, 4))
    assert ch2.sample_ext() == (1548460626, 39002199, 1146611958, 137492534)


def test_proof_codec_byte_layout():
    """Pin the proof byte encoding to the reference codec layout.

    Field order, length prefixes, and integer widths follow
    ``crates/sdk/src/codec.rs`` (reference): u32 LE version header,
    commitments, FRI proof, opened values (AdjacentOpenedValues with
    local AND next length-prefixed), per-air data carrying the trace
    *degree* (not its log), RapPhaseSeqKind byte, logup pow witness.
    """
    import hashlib

    from openvm_tpu import fri as fri_mod
    from openvm_tpu.stark import codec, prover as pv

    def d(s):
        return np.arange(s, s + 8, dtype=np.uint64)

    def ext(s):
        return (s, s + 1, s + 2, s + 3)

    adj = pv.AdjacentOpenedValues(local=[ext(10), ext(20)],
                                  next=[ext(30), ext(40)])
    proof = pv.Proof(
        commitments=pv.Commitments(
            main_trace=[d(100), d(200)], after_challenge=[d(300)],
            quotient=d(400)),
        opening=pv.Opening(
            proof=fri_mod.FriProof(
                commit_phase_commits=[d(500)],
                query_proofs=[fri_mod.QueryProof(
                    input_proof=[fri_mod.BatchOpening(
                        opened_values=[[1, 2, 3], [4, 5]],
                        opening_proof=[d(600)])],
                    commit_phase_openings=[fri_mod.CommitPhaseStep(
                        sibling_value=ext(50), opening_proof=[d(700)])])],
                final_poly=[ext(60)], pow_witness=777),
            values=pv.OpeningValues(
                preprocessed=[adj], main=[[adj]], after_challenge=[[adj]],
                quotient=[[[ext(70), ext(80)]]])),
        per_air=[pv.AirProofData(
            air_id=0, log_degree=3,
            exposed_values_after_challenge=[[ext(90)]],
            public_values=[7, 8])],
        air_perm_by_height=[0], log_up_pow_witness=999)

    blob = codec.encode_proof(proof)
    assert len(blob) == 665
    # header: codec version 1 (codec.rs:27); then 2 main-trace commits
    assert blob[:8] == bytes.fromhex("0100000002000000")
    # trailer: RapPhaseSeqKind::FriLogUp byte + pow witness 999 u32 LE
    assert blob[-5:] == bytes.fromhex("00e7030000")
    assert hashlib.sha256(blob).hexdigest() == (
        "ca080bacdcea1da8b75aae72aee556cf11cc57b8382a445a8195d7ca9db0b176")

    proof2 = codec.decode_proof(blob)
    assert codec.encode_proof(proof2) == blob
    assert proof2.air_perm_by_height == [0]
    assert proof2.per_air[0].log_degree == 3

    # malformed inputs fail loudly, never mis-parse
    with pytest.raises(codec.CodecError):
        codec.decode_proof(b"\x02\x00\x00\x00" + blob[4:])  # bad version
    with pytest.raises(codec.CodecError):
        codec.decode_proof(blob + b"\x00")  # trailing bytes
