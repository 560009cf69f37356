"""Bit-exactness parity tests for Poseidon-GL vs the reference testvectors.

The e2e input JSONs carry the genesis SMT as a ``db`` map of
node-hash -> node-preimage (reference src/prover/input.cpp:738-778, nodes
written by Smt::hashSave, smt.cpp:1070-1078): every entry is a Poseidon-GL
known-answer vector (12-element preimage including the 4-element capacity;
8-element value nodes take capacity zero, input.cpp:760-767).  The key is
fea2string of the 4-element hash (scalar = h3<<192|h2<<128|h1<<64|h0,
scalar.hpp:63-72).

The official parameter set (goldilocks submodule, not in the snapshot) was
recovered from in-tree artifacts: the round constants in
src/sm/poseidon_g/poseidon_g_executor.cpp:11-105 with the plonky2-style
circulant MDS where the +8 diagonal boost applies at M[0][0] ONLY.  These
tests pin that discovery: both the device (JAX) and native (C) permutations
must reproduce every node hash of every e2e vector.
"""

import glob
import json

import numpy as np
import pytest

from xlayer_prover_tpu.fields import gl
from xlayer_prover_tpu.ops import poseidon_constants as pc
from xlayer_prover_tpu.ops import poseidon_gl

E2E = sorted(glob.glob(
    "/root/reference/testvectors/e2e/fork_9/input_executor_*.json"))


def _db_kats(path):
    """(preimage12, hash4) known-answer pairs from an input JSON db map."""
    with open(path) as f:
        db = json.load(f).get("db", {})
    kats = []
    for k, v in db.items():
        words = [int(w, 16) for w in v]
        if len(words) == 8:
            words = words + [0, 0, 0, 0]
        if len(words) != 12:
            continue  # contract bytecode blobs etc.
        key = int(k, 16)
        h = [(key >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]
        kats.append((words, h))
    return kats


def test_official_constants_present():
    assert pc.get_params()[2] == "official"


@pytest.mark.skipif(not E2E, reason="reference testvectors not present")
def test_smt_node_hash_parity():
    kats = [kat for p in E2E for kat in _db_kats(p)]
    assert len(kats) >= 80
    inp = gl.from_u64_np(np.array([w for w, _ in kats], dtype=np.uint64))
    out = gl.to_u64_np(poseidon_gl.permute(inp))[:, :4]
    expect = np.array([h for _, h in kats], dtype=np.uint64)
    assert (out == expect).all()


@pytest.mark.skipif(not E2E, reason="reference testvectors not present")
def test_native_node_hash_parity():
    from xlayer_prover_tpu.native import poseidon_permute
    kats = [kat for p in E2E for kat in _db_kats(p)]
    for words, h in kats:
        assert tuple(poseidon_permute(list(words))[:4]) == tuple(h)


@pytest.mark.skipif(not E2E, reason="reference testvectors not present")
def test_mds_diag_subtlety():
    """Document the recovery: the SAME round constants with +8 applied to
    the whole MDS diagonal (instead of only M[0][0]) do NOT match — this is
    the variant the round-1 search wrongly concluded was 'stale'."""
    C, _, origin = pc.get_params()
    assert origin == "official"
    P = gl.P
    MCIRC = [17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20]
    M_wrong = [[MCIRC[(-i + j + 12) % 12] + (8 if i == j else 0)
                for j in range(12)] for i in range(12)]
    words, h = _db_kats(E2E[0])[0]
    st = list(words)
    for r in range(30):
        st = [(st[s] + C[r * 12 + s]) % P for s in range(12)]
        if r < 4 or r >= 26:
            st = [pow(x, 7, P) for x in st]
        else:
            st[0] = pow(st[0], 7, P)
        st = [sum(M_wrong[x][y] * st[y] for y in range(12)) % P
              for x in range(12)]
    assert st[:4] != h
