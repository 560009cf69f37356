"""Poseidon permutation over Goldilocks + linear hash + Merkle primitives.

TPU-native equivalent of the reference's ``PoseidonGoldilocks`` usage:
  * ``permute``  — the t=12 Poseidon permutation, vectorized over a batch,
    as a lax.scan over the 30 rounds (graph stays one round deep).
  * ``linear_hash`` — arbitrary-width row hashing to 4 elements (leaf hash),
    chunked by RATE=8 with the previous digest chained into the capacity,
    as used by MerkleTreeGL (merkleTreeGL.cpp:37-44).
  * ``hash_node`` — internal tree node: permute(left4 || right4 || 0^4)[0:4].

Round layout (x^7 S-box, R_F=8 full + R_P=22 partial, ARK -> S-box -> MDS,
S-box on lane 0 only in partial rounds) follows the canonical Poseidon
specification; constants come from poseidon_constants.get_params()
(generated, or an official drop-in file).
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
HASH_SIZE = 4


@functools.lru_cache(maxsize=None)
def _tables():
    consts, mds, origin = pc.get_params()
    n_rounds = pc.FULL_ROUNDS + pc.PARTIAL_ROUNDS
    c = np.array(consts, dtype=np.uint64).reshape(n_rounds, WIDTH)
    m = np.array(mds, dtype=np.uint64)
    half = pc.FULL_ROUNDS // 2
    is_full = np.zeros(n_rounds, dtype=bool)
    is_full[:half] = True
    is_full[half + pc.PARTIAL_ROUNDS:] = True
    return c, m, is_full, origin


def _sbox(x):
    x2 = gl.mul(x, x)
    x4 = gl.mul(x2, x2)
    return gl.mul(gl.mul(x4, x2), x)


def _mds(state, m):
    """state (..., 12): out_j = sum_i s_i M[i][j], via broadcast + tree sum."""
    prod = gl.mul(state[..., :, None], m)           # (..., i, j)
    padcfg = [(0, 0)] * (prod.ndim - 2) + [(0, 4), (0, 0)]
    acc = jnp.pad(prod, padcfg)                     # i-axis 12 -> 16
    k = 16
    while k > 1:
        k //= 2
        acc = gl.add(acc[..., :k, :], acc[..., k:, :])
    return acc[..., 0, :]


@jax.jit
def permute_u64(state):
    """Poseidon permutation; state = (..., 12) uint64 array (XLA u64
    emulation — the generic/reference device path)."""
    c, m, is_full, _ = _tables()

    def round_fn(st, inp):
        consts, full = inp
        st = gl.add(st, consts)
        sb = _sbox(st)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, st.shape, st.ndim - 1) == 0
        st = jnp.where(full | lane0, sb, st)
        return _mds(st, m), None

    state, _ = jax.lax.scan(round_fn, state,
                            (jnp.asarray(c), jnp.asarray(is_full)))
    return state


# Backend selection for the hot path (linear_hash / hash_node / Merkle):
#   u64        — XLA uint64 emulation (reference path, fastest CPU compile)
#   small      — u32-pair S-box + small-entry VPU MDS (pallas_poseidon)
#   small_lazy — same with non-canonical intermediates (one cond-sub at
#                the end); measured fastest on v5e silicon (~16 Mperm/s
#                vs 14 for small, 12 mxu, 4 u64 — see BENCH_r03)
#   mxu        — u32-pair S-box + exact bf16 limb matmul MDS on the MXU
# "auto" resolves per jax backend: CPU keeps u64 (native 64-bit ALUs and
# small compile graphs); TPU uses the lazy small-MDS u32 path (no native
# u64 lanes).
import os as _os

_BACKEND = _os.environ.get("XLAYER_POSEIDON_BACKEND", "auto")


@functools.lru_cache(maxsize=None)
def _silicon_winner() -> str:
    """Fastest measured permutation backend from the last on-silicon
    shootout (bench.py writes poseidon_perm_*_Mhz into BENCH_LAST.json);
    defaults to small_lazy when no measurement exists."""
    import json as _json
    path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__)))), "BENCH_LAST.json")
    try:
        with open(path) as f:
            data = _json.load(f)
        rates = {"small_lazy": data.get("poseidon_perm_lazy_Mhz", 0),
                 "small_lazy_t": data.get("poseidon_perm_lazy_t_Mhz", 0),
                 "small_lazy_mxu": data.get("poseidon_perm_lazy_mxu_Mhz",
                                            0)}
        best = max(rates, key=rates.get)
        if rates[best] > 0:
            return best
    except Exception:  # noqa: BLE001 - no measurement yet
        pass
    return "small_lazy"


def _resolve_backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    return "u64" if jax.default_backend() == "cpu" else _silicon_winner()


def permute(state):
    """Poseidon permutation; state = (..., 12) uint64 array.  Dispatches
    to the fastest exact backend for the active device (all backends are
    bit-identical; tests/test_pallas_poseidon.py pins them to each other
    and to the host oracle)."""
    kind = _resolve_backend()
    if kind == "u64":
        return permute_u64(state)
    from . import pallas_poseidon as pp
    fn = {"small": pp.permute_small, "small_lazy": pp.permute_small_lazy,
          "small_lazy_t": pp.permute_small_lazy_t,
          "small_lazy_mxu": pp.permute_small_lazy_mxu,
          "small_t": pp.permute_small_t, "mxu": pp.permute_mxu,
          "u32": pp.permute_u32}[kind]
    if state.ndim == 2:
        return fn(state)
    lead = state.shape[:-1]
    return fn(state.reshape(-1, WIDTH)).reshape(*lead, WIDTH)


def hash_n_to_4(inputs):
    return permute(inputs)[..., :HASH_SIZE]


@functools.partial(jax.jit, static_argnums=(1,))
def linear_hash(rows, width: int):
    """Hash rows of `width` elements to 4-element digests, vectorized.

    Mirrors PoseidonGoldilocks::linear_hash: width <= 4 returns the
    zero-padded row; otherwise absorb RATE-chunks with the previous digest
    as capacity (zero-seeded).
    """
    batch = rows.shape[0]
    assert rows.shape[1] == width
    if width <= CAPACITY:
        return jnp.pad(rows, ((0, 0), (0, CAPACITY - width)))
    digest = gl.zeros((batch, CAPACITY))
    for start in range(0, width, RATE):
        n = min(RATE, width - start)
        chunk = rows[:, start:start + n]
        if n < RATE:
            chunk = jnp.pad(chunk, ((0, 0), (0, RATE - n)))
        digest = hash_n_to_4(jnp.concatenate([chunk, digest], axis=1))
    return digest


@jax.jit
def hash_node(left, right):
    """Internal Merkle node: permute(left4 || right4 || 0^4)[0:4]."""
    zero_cap = gl.zeros((left.shape[0], CAPACITY))
    return hash_n_to_4(jnp.concatenate([left, right, zero_cap], axis=1))
