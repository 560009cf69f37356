"""Poseidon permutation over Goldilocks + linear hash + Merkle primitives.

TPU-native equivalent of the reference's ``PoseidonGoldilocks`` usage:
  * ``permute``  — the t=12 Poseidon permutation, vectorized over a batch.
  * ``linear_hash`` — arbitrary-width row hashing to 4 elements (leaf hash),
    chunked by RATE=8 with the previous digest chained into the capacity,
    as used by MerkleTreeGL (merkleTreeGL.cpp:37-44).
  * ``hash_node`` — internal tree node: permute(left4 || right4 || 0^4)[0:4].

Constraint layout (x^7 S-box, R_F=8 full + R_P=22 partial rounds, ARK ->
S-box -> MDS per round, S-box on lane 0 only in partial rounds) follows the
canonical Poseidon specification; constants come from
``poseidon_constants.get_params()`` (generated, or official drop-in file).
All functions are jit-safe; batch shapes are static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl
from . import poseidon_constants as pc

WIDTH = pc.WIDTH
RATE = pc.RATE
CAPACITY = pc.CAPACITY
HASH_SIZE = 4  # digest = first 4 state elements


@functools.lru_cache(maxsize=None)
def _tables():
    """Round constants as (n_rounds, 12) uint32 numpy pair + MDS columns."""
    consts, mds, origin = pc.get_params()
    n_rounds = pc.FULL_ROUNDS + pc.PARTIAL_ROUNDS
    c = np.array(consts, dtype=np.uint64).reshape(n_rounds, WIDTH)
    c_lo = (c & 0xFFFFFFFF).astype(np.uint32)
    c_hi = (c >> 32).astype(np.uint32)
    m = np.array(mds, dtype=np.uint64)  # m[i][j]
    m_lo = (m & 0xFFFFFFFF).astype(np.uint32)
    m_hi = (m >> 32).astype(np.uint32)
    return (c_lo, c_hi), (m_lo, m_hi), origin


def _sbox(x):
    x2 = gl.mul(x, x)
    x4 = gl.mul(x2, x2)
    x3 = gl.mul(x2, x)
    return gl.mul(x4, x3)


def _mds(state):
    """state: pair of (..., 12) -> out_j = sum_i s_i M[i][j].

    One broadcast field-mul of shape (..., 12, 12) + a padded tree reduction
    over i (modular add is done pairwise; jnp.sum can't reduce limb pairs).
    """
    _, (m_lo, m_hi), _ = _tables()
    prod = gl.mul((state[0][..., :, None], state[1][..., :, None]),
                  (m_lo, m_hi))  # (..., i, j)
    # pad i-axis 12 -> 16, then 4 halving adds
    padcfg = [(0, 0)] * (prod[0].ndim - 2) + [(0, 4), (0, 0)]
    acc = (jnp.pad(prod[0], padcfg), jnp.pad(prod[1], padcfg))
    k = 16
    while k > 1:
        k //= 2
        acc = gl.add((acc[0][..., :k, :], acc[1][..., :k, :]),
                     (acc[0][..., k:, :], acc[1][..., k:, :]))
    return (acc[0][..., 0, :], acc[1][..., 0, :])


@functools.lru_cache(maxsize=None)
def _round_tables_np():
    """Per-round constant/mask arrays for the lax.scan round loop."""
    (c_lo, c_hi), _, _ = _tables()
    n_rounds = pc.FULL_ROUNDS + pc.PARTIAL_ROUNDS
    half = pc.FULL_ROUNDS // 2
    is_full = np.zeros(n_rounds, dtype=bool)
    is_full[:half] = True
    is_full[half + pc.PARTIAL_ROUNDS:] = True
    return c_lo, c_hi, is_full


@jax.jit
def permute(state):
    """Poseidon permutation; state = pair of (..., 12) uint32 arrays.

    A lax.scan over the 30 rounds (full-round flag as a scanned input) keeps
    the compiled graph one round deep.
    """
    c_lo, c_hi, is_full = _round_tables_np()

    def round_fn(st, inp):
        clo, chi, full = inp
        st = gl.add(st, (clo, chi))
        sb = _sbox(st)
        # partial rounds: S-box on lane 0 only
        lane0 = jax.lax.broadcasted_iota(jnp.int32, st[0].shape, st[0].ndim - 1) == 0
        keep = full | lane0
        st = (jnp.where(keep, sb[0], st[0]), jnp.where(keep, sb[1], st[1]))
        st = _mds(st)
        return st, None

    state, _ = jax.lax.scan(round_fn, state,
                            (jnp.asarray(c_lo), jnp.asarray(c_hi), jnp.asarray(is_full)))
    return state


def hash_n_to_4(inputs):
    """Single permutation digest: inputs = pair of (..., 12) -> (..., 4)."""
    out = permute(inputs)
    return (out[0][..., :HASH_SIZE], out[1][..., :HASH_SIZE])


@functools.partial(jax.jit, static_argnums=(1,))
def linear_hash(rows, width: int):
    """Hash rows of `width` elements to 4-element digests, vectorized.

    rows: pair of (batch, width). Semantics mirror PoseidonGoldilocks::
    linear_hash: width <= 4 returns the zero-padded row; otherwise absorb
    chunks of RATE with the previous digest as capacity (zero-seeded).
    """
    lo, hi = rows
    batch = lo.shape[0]
    assert lo.shape[1] == width
    if width <= CAPACITY:
        pad = CAPACITY - width
        return (jnp.pad(lo, ((0, 0), (0, pad))), jnp.pad(hi, ((0, 0), (0, pad))))
    digest = gl.zeros((batch, CAPACITY))
    for start in range(0, width, RATE):
        n = min(RATE, width - start)
        chunk = (lo[:, start:start + n], hi[:, start:start + n])
        if n < RATE:
            chunk = (jnp.pad(chunk[0], ((0, 0), (0, RATE - n))),
                     jnp.pad(chunk[1], ((0, 0), (0, RATE - n))))
        state = (jnp.concatenate([chunk[0], digest[0]], axis=1),
                 jnp.concatenate([chunk[1], digest[1]], axis=1))
        digest = hash_n_to_4(state)
    return digest


@jax.jit
def hash_node(left, right):
    """Internal Merkle node: permute(left4 || right4 || 0^4)[0:4]."""
    batch = left[0].shape[0]
    zero_cap = gl.zeros((batch, CAPACITY))
    state = (jnp.concatenate([left[0], right[0], zero_cap[0]], axis=1),
             jnp.concatenate([left[1], right[1], zero_cap[1]], axis=1))
    return hash_n_to_4(state)
