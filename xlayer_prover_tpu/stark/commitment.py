"""Commitment schemes: Poseidon-GL binary trees vs Poseidon-BN254
arity-16 trees + matching transcripts.

The reference's recursiveF stage re-instantiates the whole STARK pipeline
with MerkleTreeBN128 + TranscriptBN128 (starkRecursiveF.cpp:151-242) so
the final proof is cheap to verify inside a BN254 circuit.  Here the same
prover/verifier code serves both stages: an Air carries `scheme` ("gl" or
"bn128") and gen_proof/verify/FRI route every commitment through these
objects.

BN128 packing follows merkleTreeBN128.cpp:90-154: 3 Goldilocks values per
Fr element (g0 + g1*2^64 + g2*2^128), leaves chained through t<=17
Poseidon-BN254 permutations with the running digest as capacity, arity-16
internal nodes; widths <= 4 pack the row into a single Fr.  The BN128
transcript (transcriptBN128.cpp) draws 3x64-bit Goldilocks challenges per
253-bit field element.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..fields import gl
from ..ops import merkle as merkle_gl
from ..ops import poseidon_bn254
from .transcript import Transcript

FR_P = poseidon_bn254.P


# ---------------------------------------------------------------------------
# GL scheme (Poseidon-Goldilocks binary trees) — the existing fast path
# ---------------------------------------------------------------------------

class GLScheme:
    name = "gl"
    root_size = 4

    def transcript(self):
        return Transcript()

    def merkelize(self, rows, width: int):
        if isinstance(rows, np.ndarray):
            # host-resident section: streamed absorption, bit-identical
            return merkle_gl.merkelize_np(rows, width, keep_levels_np=True)
        return merkle_gl.merkelize(rows, width)

    def root(self, tree) -> List[int]:
        return [int(v) for v in tree.root_np()]

    def open(self, tree, source_np, idx: int):
        path = merkle_gl.get_proof(tree, idx)
        return ([int(v) for v in source_np[idx]],
                [[int(x) for x in s] for s in path])

    def open_many(self, tree, source, idxs):
        """Batched openings: one row gather + one path gather (single host
        pull each) — sources/levels may live on a remote device."""
        rows = merkle_gl.gather_rows(source, idxs)
        paths = merkle_gl.get_proofs_batch(tree, idxs)
        return [([int(v) for v in rows[k]],
                 [[int(x) for x in lvl] for lvl in paths[k]])
                for k in range(len(idxs))]

    def verify(self, root, idx: int, leaf_values, siblings) -> bool:
        from ..ops.merkle import _host_linear_hash, _host_permute
        digest = _host_linear_hash([v % gl.P for v in leaf_values])
        for sib in siblings:
            if idx & 1:
                state = list(sib) + digest + [0, 0, 0, 0]
            else:
                state = digest + list(sib) + [0, 0, 0, 0]
            digest = _host_permute(state)[:4]
            idx >>= 1
        return digest == [v % gl.P for v in root]


# ---------------------------------------------------------------------------
# BN128 scheme (Poseidon-BN254 arity-16 trees, host-side)
# ---------------------------------------------------------------------------

ARITY = 16
GL_PER_FR = 3


def _pack_row(row) -> List[int]:
    """Row of GL u64 values -> Fr elements (3 per Fr)."""
    out = []
    for start in range(0, len(row), GL_PER_FR):
        chunk = row[start:start + GL_PER_FR]
        v = 0
        for k, g in enumerate(chunk):
            v |= int(g) << (64 * k)
        out.append(v % FR_P)
    return out


def leaf_hash_bn128(row) -> int:
    """merkleTreeBN128 linearHash of one row of GL values."""
    w = len(row)
    if w <= 4:
        v = 0
        for k, g in enumerate(row):
            v |= int(g) << (64 * k)
        return v % FR_P
    packed = _pack_row(row)
    digest = 0
    pending = len(packed)
    pos = 0
    while pending > 0:
        batch = min(ARITY, pending)
        elements = [digest] + packed[pos:pos + batch]
        digest = poseidon_bn254.permute(elements
                                        + [0] * (ARITY + 1 - len(elements))
                                        if batch == ARITY else elements)[0]
        pos += batch
        pending -= batch
    return digest


@dataclasses.dataclass
class BN128Tree:
    levels: List[List[int]]       # levels[0] = leaf digests ... [-1] = [root]
    height: int

    def root(self) -> int:
        return self.levels[-1][0]


def _permute_batch(states: List[List[int]]) -> List[List[int]]:
    """Batch permutations of uniform width through the native core (one
    ctypes call), falling back per-state to the Python path."""
    if not states:
        return []
    t = len(states[0])
    lib = poseidon_bn254._native_ready(t)
    if lib is None:
        return [poseidon_bn254.permute(s) for s in states]
    import ctypes
    n = len(states)
    flat = []
    mask = 0xFFFFFFFFFFFFFFFF
    for s in states:
        for v in s:
            v = int(v) % FR_P
            flat.extend(((v >> (64 * k)) & mask for k in range(4)))
    io = (ctypes.c_uint64 * len(flat))(*flat)
    rc = lib.posbn_permute_batch(t, n, io)
    assert rc == 0
    raw = list(io)
    out = []
    for b in range(n):
        base = b * t * 4
        out.append([raw[base + i * 4] | (raw[base + i * 4 + 1] << 64)
                    | (raw[base + i * 4 + 2] << 128)
                    | (raw[base + i * 4 + 3] << 192) for i in range(t)])
    return out


def _leaf_hashes_batch(rows_u64: np.ndarray) -> List[int]:
    """linearHash over every row, absorb-round-batched: all rows share
    one packed width, so each sponge round is a single uniform-width
    native batch (merkleTreeBN128.cpp:90-154 semantics unchanged)."""
    height, w = rows_u64.shape
    if w <= 4:
        return [leaf_hash_bn128(list(rows_u64[i])) for i in range(height)]
    packed = [_pack_row(list(rows_u64[i])) for i in range(height)]
    digests = [0] * height
    pos = 0
    total = len(packed[0])
    while pos < total:
        batch = min(ARITY, total - pos)
        pad = [0] * (ARITY - batch) if batch == ARITY else []
        states = [[digests[i]] + packed[i][pos:pos + batch] + pad
                  for i in range(height)]
        outs = _permute_batch(states)
        for i in range(height):
            digests[i] = outs[i][0]
        pos += batch
    return digests


def build_tree_bn128(rows_u64: np.ndarray) -> BN128Tree:
    height = rows_u64.shape[0]
    leaves = _leaf_hashes_batch(rows_u64)
    levels = [leaves]
    cur = leaves
    while len(cur) > 1:
        states = []
        for i in range(0, len(cur), ARITY):
            group = cur[i:i + ARITY]
            group = group + [0] * (ARITY - len(group))
            states.append([0] + group)
        outs = _permute_batch(states)
        nxt = [o[0] for o in outs]
        levels.append(nxt)
        cur = nxt
    return BN128Tree(levels=levels, height=height)


class BN128Scheme:
    name = "bn128"
    root_size = 1

    def transcript(self):
        return TranscriptBN128()

    def merkelize(self, rows_dev, width: int):
        rows_np = gl.to_u64_np(rows_dev) if not isinstance(rows_dev,
                                                           np.ndarray) \
            else rows_dev
        return BN128Tree_Handle(build_tree_bn128(rows_np))

    def root(self, tree) -> List[int]:
        return [tree.tree.root()]

    def open(self, tree, source_np, idx: int):
        t = tree.tree
        values = [int(v) for v in source_np[idx]]
        siblings = []
        cur = idx
        for level in t.levels[:-1]:
            base = (cur // ARITY) * ARITY
            group = level[base:base + ARITY]
            group = group + [0] * (ARITY - len(group))
            siblings.append([int(v) for v in group])
            cur //= ARITY
        return values, siblings

    def verify(self, root, idx: int, leaf_values, siblings) -> bool:
        digest = leaf_hash_bn128([v % gl.P for v in leaf_values])
        cur = idx
        for group in siblings:
            if group[cur % ARITY] != digest:
                return False
            digest = poseidon_bn254.permute([0] + list(group))[0]
            cur //= ARITY
        return digest == root[0] % FR_P


class BN128Tree_Handle:
    """Adapter so prover code can treat both trees uniformly."""

    def __init__(self, tree: BN128Tree):
        self.tree = tree

    def root_np(self):
        return [self.tree.root()]


# ---------------------------------------------------------------------------
# TranscriptBN128 (transcriptBN128.cpp semantics, host-exact)
# ---------------------------------------------------------------------------

class TranscriptBN128:
    def __init__(self):
        self.state = [0]
        self.pending: List[int] = []
        self.out: List[int] = [0]      # reference quirk: starts with a zero
        self.out3: List[int] = []

    def put(self, values):
        for v in values:
            self.pending.append(int(v) % FR_P)
            self.out = []
            self.out3 = []
            if len(self.pending) == ARITY:
                self._update()

    def _update(self):
        while len(self.pending) < ARITY:
            self.pending.append(0)
        full = self.state + self.pending
        out = poseidon_bn254.permute(full)
        self.out = list(out)
        self.state = [out[0]]
        self.out3 = []
        self.pending = []

    def get_fields253(self) -> int:
        if self.out:
            return self.out.pop(0)
        self._update()
        return self.get_fields253()

    def get_fields1(self) -> int:
        if self.out3:
            return self.out3.pop(0)
        if self.out:
            v = self.out.pop(0)
            self.out3 = [(v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
                         for k in range(3)]
            return self.get_fields1()
        self._update()
        return self.get_fields1()

    def get_field(self):
        return [self.get_fields1() for _ in range(3)]

    def get_permutations(self, n: int, n_bits: int):
        total = n * n_bits
        n_fields = (total - 1) // 253 + 1
        fields = [self.get_fields253() for _ in range(n_fields)]
        res = []
        cur_field = 0
        cur_bit = 0
        for _ in range(n):
            a = 0
            for j in range(n_bits):
                if (fields[cur_field] >> cur_bit) & 1:
                    a += 1 << j
                cur_bit += 1
                if cur_bit == 253:
                    cur_bit = 0
                    cur_field += 1
            res.append(a)
        return res


SCHEMES = {"gl": GLScheme(), "bn128": BN128Scheme()}


def get_scheme(air):
    return SCHEMES[getattr(air, "scheme", "gl")]
