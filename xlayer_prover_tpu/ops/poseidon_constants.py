"""Poseidon-Goldilocks parameter loading (official) and generation (fallback).

The reference consumes ``PoseidonGoldilocks`` from the goldilocks submodule
(not checked out in the snapshot: /root/reference/.gitmodules:1-3).  The
official parameter set was nevertheless recovered in-tree: the round
constants at src/sm/poseidon_g/poseidon_g_executor.cpp:11-105 ARE the
production table, combined with the plonky2-style circulant MDS
[17,15,41,16,2,28,13,13,39,18,34,20] where the +8 diagonal boost applies to
M[0][0] ONLY (not the whole diagonal — the subtlety that defeated the
round-1 structural search).  This reconstruction reproduces every node-hash
known-answer pair in the e2e testvector ``db`` maps (82/82, see
tests/test_poseidon_parity.py), so it is bit-exact with the reference
prover.  It ships as ``data/poseidon_goldilocks_official.json``
({"C": [360], "M": [[12x12]]}, M stored in this module's row-vector
convention out_j = sum_i s_i*M[i][j]).

A deterministic Grain-LFSR parameter set (same t=12, R_F=8, R_P=22 shape)
remains as a fallback when the file is absent.
"""

from __future__ import annotations

import functools
import json
import os

from ..fields import gl

P = gl.P

WIDTH = 12          # t: state width (8 rate + 4 capacity), as the reference
RATE = 8
CAPACITY = 4
FULL_ROUNDS = 8     # R_F (4 at start, 4 at end)
PARTIAL_ROUNDS = 22  # R_P
N_ROUND_CONSTANTS = WIDTH * (FULL_ROUNDS + PARTIAL_ROUNDS)  # 360

_OFFICIAL_FILE = os.path.join(os.path.dirname(__file__), "data",
                              "poseidon_goldilocks_official.json")


class _GrainLFSR:
    """Grain LFSR from the Poseidon reference parameter generation.

    80-bit state initialised from the instance descriptor; after 160 warm-up
    rounds, outputs field elements by rejection sampling 64-bit strings.
    """

    def __init__(self, field_tag: int, sbox_tag: int, n: int, t: int,
                 r_f: int, r_p: int):
        bits = []
        for val, width in [(field_tag, 2), (sbox_tag, 4), (n, 12), (t, 12),
                           (r_f, 10), (r_p, 10)]:
            bits.extend((val >> (width - 1 - i)) & 1 for i in range(width))
        bits.extend([1] * 30)
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._next_bit()

    def _next_bit(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def _next_filtered_bit(self) -> int:
        while True:
            b1 = self._next_bit()
            b2 = self._next_bit()
            if b1:
                return b2

    def next_field_element(self) -> int:
        while True:
            v = 0
            for _ in range(64):
                v = (v << 1) | self._next_filtered_bit()
            if v < P:
                return v


@functools.lru_cache(maxsize=None)
def generate_params():
    """(C[360], M[12][12]) as python ints. Deterministic."""
    lfsr = _GrainLFSR(field_tag=1, sbox_tag=0, n=64, t=WIDTH,
                      r_f=FULL_ROUNDS, r_p=PARTIAL_ROUNDS)
    consts = [lfsr.next_field_element() for _ in range(N_ROUND_CONSTANTS)]
    mds = [[pow((i + WIDTH + j) % P, P - 2, P) for j in range(WIDTH)]
           for i in range(WIDTH)]
    return consts, mds


@functools.lru_cache(maxsize=None)
def get_params():
    """Load official constants if present, else the generated set."""
    if os.path.exists(_OFFICIAL_FILE):
        with open(_OFFICIAL_FILE) as f:
            data = json.load(f)
        consts = [int(c) % P for c in data["C"]]
        mds = [[int(v) % P for v in row] for row in data["M"]]
        assert len(consts) >= N_ROUND_CONSTANTS and len(mds) == WIDTH
        return consts[:N_ROUND_CONSTANTS], mds, "official"
    consts, mds = generate_params()
    return consts, mds, "generated"
