"""Poseidon-Goldilocks binary Merkle tree over row-major polynomial sources.

TPU-native equivalent of the reference MerkleTreeGL
(/root/reference/src/starkpil/merkleTree/merkleTreeGL.{hpp,cpp}): leaves are
``linear_hash`` digests of (height x width) rows; internal levels pair-hash
with zero capacity.  The build is a sequence of vectorized level reductions
(device-side); proof extraction gathers sibling digests like
getGroupProof/genMerkleProof.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl
from . import poseidon_gl as poseidon


class MerkleTree(NamedTuple):
    """levels[0] = leaf digests (n, 4) ... levels[-1] = root (1, 4)."""
    levels: tuple
    width: int

    @property
    def height(self):
        return self.levels[0].shape[0]

    @property
    def root(self):
        return self.levels[-1][0]

    def root_np(self) -> np.ndarray:
        return gl.to_u64_np(self.root)


@functools.partial(jax.jit, static_argnums=(1,))
def _build_levels(rows, width: int):
    n = rows.shape[0]
    assert n & (n - 1) == 0, "height must be a power of two"
    cur = poseidon.linear_hash(rows, width)
    levels = [cur]
    while cur.shape[0] > 1:
        cur = poseidon.hash_node(cur[0::2], cur[1::2])
        levels.append(cur)
    return tuple(levels)


# Levels at or below 2^_CUT_BITS rows finish on the host: each device
# level is a separate XLA graph instance (shapes halve), so a 2^21-leaf
# tree unrolls 21 permutation graphs — minutes of (remote) compile for
# microseconds of work in the tiny top.  The host tail is the native C
# Poseidon (bit-identical; pinned by tests) over one small pull.
_CUT_BITS = 11


@functools.partial(jax.jit, static_argnums=(1,))
def _build_levels_device(rows, width: int):
    n = rows.shape[0]
    assert n & (n - 1) == 0, "height must be a power of two"
    cur = poseidon.linear_hash(rows, width)
    levels = [cur]
    while cur.shape[0] > (1 << _CUT_BITS):
        cur = poseidon.hash_node(cur[0::2], cur[1::2])
        levels.append(cur)
    return tuple(levels)


def _host_levels_above(top_np: np.ndarray):
    """Finish a tree from a (m, 4) digest level on host (native Poseidon)."""
    from ..native import poseidon_permute_batch
    levels = []
    cur = np.ascontiguousarray(top_np, dtype=np.uint64)
    while cur.shape[0] > 1:
        states = np.zeros((cur.shape[0] // 2, 12), dtype=np.uint64)
        states[:, 0:4] = cur[0::2]
        states[:, 4:8] = cur[1::2]
        cur = poseidon_permute_batch(states)[:, :4]
        levels.append(cur)
    return levels


# Trees up to this many leaves build fully on device in one jit (the
# unrolled level count stays compile-friendly); bigger trees switch to
# the two-tier build so the graph never exceeds ~leaf+10 level instances.
_FULL_DEVICE_BITS = 16


def merkelize(rows, width: int) -> MerkleTree:
    """rows: (height, width) uint64 array (device).  Small trees build
    fully on device in one jit; for big trees the top (<= 2^_CUT_BITS
    rows) finishes on host from a single small pull — same digests,
    fraction of the compile."""
    if rows.shape[0] <= (1 << _FULL_DEVICE_BITS):
        return MerkleTree(levels=_build_levels(rows, width), width=width)
    dev_levels = _build_levels_device(rows, width)
    top = gl.to_u64_np(dev_levels[-1])
    host_levels = _host_levels_above(top) if top.shape[0] > 1 else []
    return MerkleTree(levels=tuple(dev_levels) + tuple(host_levels),
                      width=width)


@jax.jit
def _absorb_chunk(chunk, digest):
    """One linear_hash sponge step: permute(chunk8 || digest4)[:4]."""
    return poseidon.hash_n_to_4(jnp.concatenate([chunk, digest], axis=1))


@functools.partial(jax.jit, static_argnums=())
def _levels_from_leaves_device(leaves):
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > (1 << _CUT_BITS):
        cur = poseidon.hash_node(cur[0::2], cur[1::2])
        levels.append(cur)
    return tuple(levels)


@functools.partial(jax.jit, static_argnums=())
def _levels_from_leaves_full(leaves):
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = poseidon.hash_node(cur[0::2], cur[1::2])
        levels.append(cur)
    return tuple(levels)


def _levels_from_leaves(leaves):
    if leaves.shape[0] <= (1 << _FULL_DEVICE_BITS):
        return _levels_from_leaves_full(leaves)
    dev_levels = _levels_from_leaves_device(leaves)
    top = gl.to_u64_np(dev_levels[-1])
    host_levels = _host_levels_above(top) if top.shape[0] > 1 else []
    return tuple(dev_levels) + tuple(host_levels)


def merkelize_np(section_np: np.ndarray, width: int,
                 keep_levels_np: bool = False) -> MerkleTree:
    """Streamed tree build over a host-resident section: leaf digests are
    computed by absorbing RATE-column blocks (device working set = one
    block + digests), then levels reduce on device.  Bit-identical to
    merkelize() — linear_hash is the same sponge walked incrementally."""
    from . import poseidon_constants as pc
    n = section_np.shape[0]
    assert section_np.shape[1] == width
    if width <= pc.CAPACITY:
        leaves = gl.from_u64_np(
            np.pad(section_np, ((0, 0), (0, pc.CAPACITY - width))))
    else:
        digest = gl.zeros((n, pc.CAPACITY))
        for s in range(0, width, pc.RATE):
            blk = section_np[:, s:s + pc.RATE]
            if blk.shape[1] < pc.RATE:
                blk = np.pad(blk, ((0, 0), (0, pc.RATE - blk.shape[1])))
            digest = _absorb_chunk(gl.from_u64_np(np.ascontiguousarray(blk)),
                                   digest)
        leaves = digest
    levels = _levels_from_leaves(leaves)
    if keep_levels_np:
        levels = tuple(np.asarray(lv, dtype=np.uint64) for lv in levels)
    return MerkleTree(levels=levels, width=width)


def get_proof(tree: MerkleTree, idx: int):
    """Sibling path for leaf `idx`: list of 4-element digests (bottom-up)."""
    path = []
    for level in tree.levels[:-1]:
        path.append(gl.to_u64_np(level[idx ^ 1]))
        idx >>= 1
    return path


def get_proofs_batch(tree: MerkleTree, indices):
    """Sibling paths for many leaves with ONE device gather per level and
    ONE host pull total: (len(indices), n_levels, 4) uint64.  The per-leaf
    per-level pulls of get_proof cost a tunnel round-trip each on remote
    devices (reference getGroupProof walks host memory, merkleTreeGL.cpp);
    levels already on the host (numpy) are indexed directly."""
    idx = np.asarray(list(indices), dtype=np.int64)
    parts = []
    cur = idx.copy()
    for level in tree.levels[:-1]:
        sib = cur ^ 1
        if isinstance(level, np.ndarray):
            parts.append(jnp.asarray(level[sib]))
        else:
            parts.append(jnp.take(level, jnp.asarray(sib), axis=0))
        cur >>= 1
    if not parts:
        return np.zeros((len(idx), 0, 4), dtype=np.uint64)
    stacked = jnp.stack(parts, axis=1)          # (n_idx, n_levels, 4)
    return np.asarray(jax.device_get(stacked), dtype=np.uint64)


def gather_rows(source, indices) -> np.ndarray:
    """Query-row extraction: (len(indices), width) uint64 with one pull."""
    idx = np.asarray(list(indices), dtype=np.int64)
    if isinstance(source, np.ndarray):
        return source[idx].astype(np.uint64)
    rows = jnp.take(source, jnp.asarray(idx), axis=0)
    return np.asarray(jax.device_get(rows), dtype=np.uint64)


def get_proofs_np(tree: MerkleTree, indices):
    """Sibling paths for many leaves with ONE host pull per level."""
    levels_np = [gl.to_u64_np(lv) for lv in tree.levels[:-1]]
    out = []
    for idx in indices:
        path = []
        i = idx
        for lv in levels_np:
            path.append(lv[i ^ 1])
            i >>= 1
        out.append(path)
    return out


def verify_proof(root_np: np.ndarray, idx: int, leaf_row_np: np.ndarray,
                 path) -> bool:
    """Host-exact verification: recompute leaf digest then walk the path."""
    digest = _host_linear_hash([int(v) for v in leaf_row_np])
    for sib in path:
        sib = [int(v) for v in sib]
        if idx & 1:
            state = sib + digest + [0, 0, 0, 0]
        else:
            state = digest + sib + [0, 0, 0, 0]
        digest = _host_permute(state)[:4]
        idx >>= 1
    return digest == [int(v) for v in root_np]


# ---------------------------------------------------------------------------
# Host-exact Poseidon oracle (python ints) for verification and tests
# ---------------------------------------------------------------------------

def _host_permute(state):
    from . import poseidon_constants as pc
    P = gl.P
    consts, mds, _ = pc.get_params()
    t = pc.WIDTH
    state = [s % P for s in state]
    r = 0
    half = pc.FULL_ROUNDS // 2

    def ark(s, r):
        return [(x + consts[r * t + i]) % P for i, x in enumerate(s)]

    def m(s):
        return [sum(s[i] * mds[i][j] for i in range(t)) % P for j in range(t)]

    for _ in range(half):
        state = m([pow(x, 7, P) for x in ark(state, r)])
        r += 1
    for _ in range(pc.PARTIAL_ROUNDS):
        state = ark(state, r)
        state[0] = pow(state[0], 7, P)
        state = m(state)
        r += 1
    for _ in range(half):
        state = m([pow(x, 7, P) for x in ark(state, r)])
        r += 1
    return state


def _host_linear_hash(row):
    from . import poseidon_constants as pc
    if len(row) <= pc.CAPACITY:
        return row + [0] * (pc.CAPACITY - len(row))
    digest = [0, 0, 0, 0]
    for start in range(0, len(row), pc.RATE):
        chunk = row[start:start + pc.RATE]
        chunk = chunk + [0] * (pc.RATE - len(chunk))
        digest = _host_permute(chunk + digest)[:4]
    return digest
