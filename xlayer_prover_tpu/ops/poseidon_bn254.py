"""Poseidon over BN254 Fr (the circomlib "optimized" variant).

Equivalent of the reference's poseidon_opt (src/poseidon_opt/
poseidon_opt.cpp, constants_opt.hpp) used by MerkleTreeBN128 and
TranscriptBN128 for the recursiveF stage: t = len(state) up to 17, 8 full
rounds, per-t partial-round counts, x^5 S-box, with the partial rounds in
the compressed (P-matrix + sparse S-vector) form.

Constants were extracted from the reference's constants_opt.hpp
(Montgomery-decoded) and validated against the canonical circomlib KAT
poseidon([1,2]) — see tools/extract_poseidon_bn254.py provenance note in
ops/data/poseidon_bn254_constants.json.
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Sequence

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617

N_ROUNDS_F = 8
N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]

_DATA = os.path.join(os.path.dirname(__file__), "data",
                     "poseidon_bn254_constants.json")


@functools.lru_cache(maxsize=None)
def _constants():
    with open(_DATA) as f:
        d = json.load(f)
    return d["C"], d["M"], d["P"], d["S"]


# ---------------------------------------------------------------------------
# Native core (native/posbn.cpp): generic 4x64 Montgomery permutation; the
# BN128 Merkle trees hash millions of leaves per recursiveF proof, which
# is hours in Python ints and minutes in C.
# ---------------------------------------------------------------------------

_NATIVE = None
_NATIVE_TS: set = set()


def _limbs(x: int) -> List[int]:
    return [(x >> (64 * k)) & 0xFFFFFFFFFFFFFFFF for k in range(4)]


def _to_arr(values, mont: bool):
    import ctypes
    flat: List[int] = []
    for v in values:
        v = int(v) % P
        if mont:
            v = (v << 256) % P
        flat.extend(_limbs(v))
    return (ctypes.c_uint64 * len(flat))(*flat)


@functools.lru_cache(maxsize=1)
def _native_lib():
    import ctypes
    path = os.path.join(os.path.dirname(__file__), "..", "native",
                        "libposbn.so")
    from ..native import ensure_built
    ensure_built(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(os.path.abspath(path))
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.posbn_init.argtypes = [u64p, u64p, ctypes.c_uint64]
    lib.posbn_set_params.argtypes = [
        ctypes.c_int, ctypes.c_int, u64p, ctypes.c_uint64, u64p, u64p,
        u64p, ctypes.c_uint64]
    lib.posbn_permute.restype = ctypes.c_int
    lib.posbn_permute.argtypes = [ctypes.c_int, u64p]
    lib.posbn_permute_batch.restype = ctypes.c_int
    lib.posbn_permute_batch.argtypes = [ctypes.c_int, ctypes.c_uint64,
                                        u64p]
    import ctypes as _ct
    r2 = (1 << 512) % P
    n0inv = (-pow(P, -1, 1 << 64)) % (1 << 64)
    # the modulus must NOT pass through _to_arr's mod-P reduction
    lib.posbn_init((_ct.c_uint64 * 4)(*_limbs(P)), _to_arr([r2], False),
                   n0inv)
    return lib


def _native_ready(t: int):
    lib = _native_lib()
    if lib is None:
        return None
    if t not in _NATIVE_TS:
        C, M, Pm, S = _constants()
        c, m, pmat, s = C[t - 2], M[t - 2], Pm[t - 2], S[t - 2]
        mf = [m[j][i] for j in range(t) for i in range(t)]
        pf = [pmat[j][i] for j in range(t) for i in range(t)]
        lib.posbn_set_params(t, N_ROUNDS_P[t - 2],
                             _to_arr(c, True), len(c),
                             _to_arr(mf, True), _to_arr(pf, True),
                             _to_arr(s, True), len(s))
        _NATIVE_TS.add(t)
    return lib


def permute(state: Sequence[int]) -> List[int]:
    """Full Poseidon permutation; t = len(state) in [2, 17]."""
    t = len(state)
    assert 2 <= t <= 17
    lib = _native_ready(t)
    if lib is not None:
        io = _to_arr(state, False)
        if lib.posbn_permute(t, io) == 0:
            raw = list(io)
            return [raw[i * 4] | (raw[i * 4 + 1] << 64)
                    | (raw[i * 4 + 2] << 128) | (raw[i * 4 + 3] << 192)
                    for i in range(t)]
    C, M, Pm, S = _constants()
    c, m, pmat, s = C[t - 2], M[t - 2], Pm[t - 2], S[t - 2]
    nrp = N_ROUNDS_P[t - 2]
    st = [v % P for v in state]

    def e5(x):
        return pow(x, 5, P)

    def mix(vals, mat):
        return [sum(mat[j][i] * vals[j] for j in range(t)) % P
                for i in range(t)]

    st = [(st[i] + c[i]) % P for i in range(t)]
    for r in range(N_ROUNDS_F // 2 - 1):
        st = [(e5(st[i]) + c[(r + 1) * t + i]) % P for i in range(t)]
        st = mix(st, m)
    st = [(e5(st[i]) + c[(N_ROUNDS_F // 2) * t + i]) % P for i in range(t)]
    st = mix(st, pmat)
    for r in range(nrp):
        st[0] = (e5(st[0]) + c[(N_ROUNDS_F // 2 + 1) * t + r]) % P
        s0 = sum(s[(t * 2 - 1) * r + j] * st[j] for j in range(t)) % P
        for j in range(1, t):
            st[j] = (st[j] + st[0] * s[(t * 2 - 1) * r + t + j - 1]) % P
        st[0] = s0
    for r in range(N_ROUNDS_F // 2 - 1):
        st = [(e5(st[i]) + c[(N_ROUNDS_F // 2 + 1) * t + nrp + r * t + i]) % P
              for i in range(t)]
        st = mix(st, m)
    st = [e5(x) for x in st]
    return mix(st, m)


def hash_n(inputs: Sequence[int]) -> int:
    """poseidon(inputs): capacity 0 prepended, first output returned
    (Poseidon_opt::hash(state, result) semantics)."""
    return permute([0] + [v % P for v in inputs])[0]
