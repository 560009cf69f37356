"""Keccak-f[1600] permutation and Keccak-256, TPU-native + host-exact.

Replaces the reference's XKCP compact Keccak
(/root/reference/src/XKCP/Keccak-more-compact.cpp) used for transcript
inputs and EVM contract hashing, and backs the KeccakF state machine's
gate-level trace (sm/keccak_f) with a direct bitwise evaluation.

Device path: ``keccak_f`` vectorizes the permutation over a batch with the 25
lanes as (batch, 25) uint32 lo/hi halves — pure VPU bitwise ops, ideal XLA.
Host path: ``keccak256`` is an exact python implementation for executor-side
hashing (to be superseded by the C++ native module for throughput).

Round constants / rotation offsets are derived programmatically from the
Keccak specification (LFSR for RC, rho schedule for offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_ROUNDS = 24
MASK64 = (1 << 64) - 1


@functools.lru_cache(maxsize=None)
def round_constants():
    """RC[24] via the rc(t) LFSR from the Keccak reference spec."""
    def rc_bit(t):
        if t % 255 == 0:
            return 1
        r = 1
        for _ in range(t % 255):
            r <<= 1
            if r & 0x100:
                r ^= 0x171
        return r & 1

    out = []
    for ir in range(NUM_ROUNDS):
        rc = 0
        for j in range(7):
            if rc_bit(j + 7 * ir):
                rc |= 1 << ((1 << j) - 1)
        out.append(rc)
    return out


@functools.lru_cache(maxsize=None)
def rotation_offsets():
    """r[x][y] from the rho schedule: (x,y)=(1,0); t: rot=(t+1)(t+2)/2."""
    r = [[0] * 5 for _ in range(5)]
    x, y = 1, 0
    for t in range(24):
        r[x][y] = ((t + 1) * (t + 2) // 2) % 64
        x, y = y, (2 * x + 3 * y) % 5
    return r


# ---------------------------------------------------------------------------
# Host-exact implementation (python ints)
# ---------------------------------------------------------------------------

def _host_keccak_f(lanes):
    """lanes: list of 25 ints (index x + 5*y). Returns permuted list."""
    rc = round_constants()
    rot = rotation_offsets()

    def rotl(v, n):
        return ((v << n) | (v >> (64 - n))) & MASK64

    a = [[lanes[x + 5 * y] for y in range(5)] for x in range(5)]
    for ir in range(NUM_ROUNDS):
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = rotl(a[x][y], rot[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y] & MASK64) & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= rc[ir]
    return [a[x][y] for y in range(5) for x in range(5)]


def keccak256(data: bytes) -> bytes:
    """EVM keccak-256 (rate 136, multi-rate padding 0x01 .. 0x80)."""
    rate = 136
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 \
        else b"\x81"
    lanes = [0] * 25
    for off in range(0, len(padded), rate):
        block = padded[off:off + rate]
        for i in range(rate // 8):
            lanes[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        lanes = _host_keccak_f(lanes)
    out = b"".join(lanes[i].to_bytes(8, "little") for i in range(4))
    return out


# ---------------------------------------------------------------------------
# Device-vectorized permutation
# ---------------------------------------------------------------------------

def _rotl(lo, hi, n):
    n %= 64
    if n == 0:
        return lo, hi
    if n < 32:
        return ((lo << n) | (hi >> (32 - n)),
                (hi << n) | (lo >> (32 - n)))
    if n == 32:
        return hi, lo
    m = n - 32
    # rotating by n = 32 + m: new64 = rotl(rotl(x,32), m); rotl32 swaps halves
    return ((hi << m) | (lo >> (32 - m)),
            (lo << m) | (hi >> (32 - m)))


@functools.lru_cache(maxsize=None)
def _vector_tables():
    """Lane-vectorized round tables (numpy, constant-folded at trace).

    Returns (rho[25], pi_src[25], rc_lo[24], rc_hi[24]) where lane index is
    x + 5*y; pi_src[i] = index of the lane that moves INTO slot i.
    """
    rot = rotation_offsets()
    rho = np.zeros(25, dtype=np.uint32)
    for x in range(5):
        for y in range(5):
            rho[x + 5 * y] = rot[x][y]
    pi_src = np.zeros(25, dtype=np.int32)
    for x in range(5):
        for y in range(5):
            # B[y][(2x+3y)%5] = A[x][y]  => slot (y + 5*((2x+3y)%5)) <- lane (x+5y)
            pi_src[y + 5 * ((2 * x + 3 * y) % 5)] = x + 5 * y
    rc = np.array(round_constants(), dtype=np.uint64)
    return (rho, pi_src,
            (rc & 0xFFFFFFFF).astype(np.uint32), (rc >> 32).astype(np.uint32))


def _rotl_vec(lo, hi, n):
    """Rotate-left 64-bit (lo, hi) lanes by per-lane amounts n (uint32 array).

    Branchless: handles n in [0, 64) including the n=0 and n=32 edge cases by
    composing two 32-bit funnel shifts selected on n >= 32.
    """
    n = n % 64
    swap = n >= 32
    m = jnp.where(swap, n - 32, n)
    l, h = (jnp.where(swap, hi, lo), jnp.where(swap, lo, hi))
    # rotate (l, h) by m in [0, 32)
    nz = m != 0
    inv = jnp.where(nz, 32 - m, 0)
    new_lo = jnp.where(nz, (l << m) | (h >> inv), l)
    new_hi = jnp.where(nz, (h << m) | (l >> inv), h)
    return new_lo, new_hi


@jax.jit
def keccak_f(state):
    """state: pair of (batch, 25) uint32 arrays (lane index x + 5*y).

    A lax.scan over the 24 rounds with lane-vectorized theta/rho/pi/chi —
    compiles to a single small round body (all VPU bitwise ops).
    """
    rho, pi_src, rc_lo, rc_hi = _vector_tables()
    lo, hi = state
    batch = lo.shape[0]

    def round_fn(st, rc):
        lo, hi = st
        a_lo = lo.reshape(batch, 5, 5)  # [batch][y][x]
        a_hi = hi.reshape(batch, 5, 5)
        # theta
        c_lo = a_lo[:, 0] ^ a_lo[:, 1] ^ a_lo[:, 2] ^ a_lo[:, 3] ^ a_lo[:, 4]
        c_hi = a_hi[:, 0] ^ a_hi[:, 1] ^ a_hi[:, 2] ^ a_hi[:, 3] ^ a_hi[:, 4]
        c1_lo, c1_hi = (c_lo << 1) | (c_hi >> 31), (c_hi << 1) | (c_lo >> 31)
        d_lo = jnp.roll(c_lo, 1, axis=-1) ^ jnp.roll(c1_lo, -1, axis=-1)
        d_hi = jnp.roll(c_hi, 1, axis=-1) ^ jnp.roll(c1_hi, -1, axis=-1)
        a_lo = (a_lo ^ d_lo[:, None, :]).reshape(batch, 25)
        a_hi = (a_hi ^ d_hi[:, None, :]).reshape(batch, 25)
        # rho (per-lane rotations) + pi (lane permutation)
        a_lo, a_hi = _rotl_vec(a_lo, a_hi, rho)
        b_lo = a_lo[:, pi_src]
        b_hi = a_hi[:, pi_src]
        # chi: A[x][y] = B[x][y] ^ (~B[x+1][y] & B[x+2][y]); x = last axis
        b_lo = b_lo.reshape(batch, 5, 5)
        b_hi = b_hi.reshape(batch, 5, 5)
        n_lo = (b_lo ^ (~jnp.roll(b_lo, -1, axis=-1) & jnp.roll(b_lo, -2, axis=-1)))
        n_hi = (b_hi ^ (~jnp.roll(b_hi, -1, axis=-1) & jnp.roll(b_hi, -2, axis=-1)))
        n_lo = n_lo.reshape(batch, 25)
        n_hi = n_hi.reshape(batch, 25)
        # iota
        n_lo = n_lo.at[:, 0].set(n_lo[:, 0] ^ rc[0])
        n_hi = n_hi.at[:, 0].set(n_hi[:, 0] ^ rc[1])
        return (n_lo, n_hi), None

    (lo, hi), _ = jax.lax.scan(round_fn, (lo, hi),
                               (jnp.asarray(rc_lo), jnp.asarray(rc_hi)))
    return lo, hi
