"""Proof serialization codec.

Role of the reference's ``crates/sdk/src/codec.rs`` (SURVEY.md section 2.16:
"Proof serialization codec"): a compact, deterministic byte encoding of the
Proof object, plus JSON for inspection.  Field elements are canonical u32
little-endian; digests are 8 u32s.
"""

from __future__ import annotations

import struct

import numpy as np

from . import prover as pv
from .. import fri as fri_mod


def _w_u32(out, v):
    out.append(struct.pack("<I", int(v) & 0xFFFFFFFF))


def _w_len(out, n):
    _w_u32(out, n)


def _w_digest(out, d):
    for x in np.asarray(d, dtype=np.uint64):
        _w_u32(out, x)


def _w_ext(out, e):
    for x in e:
        _w_u32(out, x)


def _w_adjacent(out, ao):
    _w_len(out, len(ao.local))
    for v in ao.local:
        _w_ext(out, v)
    for v in ao.next:
        _w_ext(out, v)


def encode_proof(proof) -> bytes:
    out: list[bytes] = [b"OVMT\x01"]
    c = proof.commitments
    _w_len(out, len(c.main_trace))
    for d in c.main_trace:
        _w_digest(out, d)
    _w_len(out, len(c.after_challenge))
    for d in c.after_challenge:
        _w_digest(out, d)
    _w_digest(out, c.quotient)

    _w_len(out, len(proof.per_air))
    for p in proof.per_air:
        _w_u32(out, p.air_id)
        _w_u32(out, p.log_degree)
        _w_len(out, len(p.exposed_values_after_challenge))
        for phase in p.exposed_values_after_challenge:
            _w_len(out, len(phase))
            for v in phase:
                _w_ext(out, v)
        _w_len(out, len(p.public_values))
        for v in p.public_values:
            _w_u32(out, v)

    _w_len(out, len(proof.air_perm_by_height))
    for i in proof.air_perm_by_height:
        _w_u32(out, i)
    _w_u32(out, proof.log_up_pow_witness)

    vals = proof.opening.values
    _w_len(out, len(vals.preprocessed))
    for ao in vals.preprocessed:
        _w_adjacent(out, ao)
    _w_len(out, len(vals.main))
    for mats in vals.main:
        _w_len(out, len(mats))
        for ao in mats:
            _w_adjacent(out, ao)
    _w_len(out, len(vals.after_challenge))
    for mats in vals.after_challenge:
        _w_len(out, len(mats))
        for ao in mats:
            _w_adjacent(out, ao)
    _w_len(out, len(vals.quotient))
    for chunks in vals.quotient:
        _w_len(out, len(chunks))
        for chunk in chunks:
            _w_len(out, len(chunk))
            for v in chunk:
                _w_ext(out, v)

    fp = proof.opening.proof
    _w_len(out, len(fp.commit_phase_commits))
    for d in fp.commit_phase_commits:
        _w_digest(out, d)
    _w_len(out, len(fp.final_poly))
    for v in fp.final_poly:
        _w_ext(out, v)
    _w_u32(out, fp.pow_witness)
    _w_len(out, len(fp.query_proofs))
    for qp in fp.query_proofs:
        _w_len(out, len(qp.input_proof))
        for batch in qp.input_proof:
            _w_len(out, len(batch.opened_values))
            for row in batch.opened_values:
                _w_len(out, len(row))
                for v in row:
                    _w_u32(out, v)
            _w_len(out, len(batch.opening_proof))
            for d in batch.opening_proof:
                _w_digest(out, d)
        _w_len(out, len(qp.commit_phase_openings))
        for step in qp.commit_phase_openings:
            _w_ext(out, step.sibling_value)
            _w_len(out, len(step.opening_proof))
            for d in step.opening_proof:
                _w_digest(out, d)
    return b"".join(out)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = len(b"OVMT\x01")
        assert data[:5] == b"OVMT\x01", "bad proof magic"

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def digest(self):
        return np.asarray([self.u32() for _ in range(8)], dtype=np.uint64)

    def ext(self):
        return tuple(self.u32() for _ in range(4))

    def adjacent(self):
        n = self.u32()
        local = [self.ext() for _ in range(n)]
        nxt = [self.ext() for _ in range(n)]
        return pv.AdjacentOpenedValues(local=local, next=nxt)


def decode_proof(data: bytes):
    r = _Reader(data)
    main_trace = [r.digest() for _ in range(r.u32())]
    after = [r.digest() for _ in range(r.u32())]
    quotient_c = r.digest()

    per_air = []
    for _ in range(r.u32()):
        air_id = r.u32()
        log_degree = r.u32()
        exposed = [[r.ext() for _ in range(r.u32())]
                   for _ in range(r.u32())]
        pvs = [r.u32() for _ in range(r.u32())]
        per_air.append(pv.AirProofData(
            air_id=air_id, log_degree=log_degree,
            exposed_values_after_challenge=exposed, public_values=pvs))

    perm = [r.u32() for _ in range(r.u32())]
    pow_w = r.u32()

    prep = [r.adjacent() for _ in range(r.u32())]
    main = [[r.adjacent() for _ in range(r.u32())] for _ in range(r.u32())]
    after_vals = [[r.adjacent() for _ in range(r.u32())]
                  for _ in range(r.u32())]
    quotient_vals = [[[r.ext() for _ in range(r.u32())]
                      for _ in range(r.u32())] for _ in range(r.u32())]

    cpc = [r.digest() for _ in range(r.u32())]
    final_poly = [r.ext() for _ in range(r.u32())]
    fri_pow = r.u32()
    qps = []
    for _ in range(r.u32()):
        input_proof = []
        for _ in range(r.u32()):
            rows = [[r.u32() for _ in range(r.u32())]
                    for _ in range(r.u32())]
            path = [r.digest() for _ in range(r.u32())]
            input_proof.append(fri_mod.BatchOpening(
                opened_values=rows, opening_proof=path))
        steps = []
        for _ in range(r.u32()):
            sib = r.ext()
            path = [r.digest() for _ in range(r.u32())]
            steps.append(fri_mod.CommitPhaseStep(
                sibling_value=sib, opening_proof=path))
        qps.append(fri_mod.QueryProof(input_proof=input_proof,
                                      commit_phase_openings=steps))

    return pv.Proof(
        commitments=pv.Commitments(main_trace=main_trace,
                                   after_challenge=after,
                                   quotient=quotient_c),
        opening=pv.Opening(
            proof=fri_mod.FriProof(commit_phase_commits=cpc,
                                   query_proofs=qps,
                                   final_poly=final_poly,
                                   pow_witness=fri_pow),
            values=pv.OpeningValues(preprocessed=prep, main=main,
                                    after_challenge=after_vals,
                                    quotient=quotient_vals)),
        per_air=per_air, air_perm_by_height=perm,
        log_up_pow_witness=pow_w)
