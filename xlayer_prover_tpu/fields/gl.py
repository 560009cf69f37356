"""Goldilocks field arithmetic (p = 2^64 - 2^32 + 1), TPU-native.

Elements are pairs ``(lo, hi)`` of ``uint32`` JAX arrays holding the low/high
32-bit limbs of a canonical (< p) 64-bit value.  TPUs have no native 64-bit
integer multiply, so multiplication decomposes each operand into four 16-bit
limbs (products fit exactly in uint32) followed by the standard Goldilocks
reduction exploiting 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p).

This is the TPU-native equivalent of the reference's Goldilocks scalar/AVX
library (consumed throughout /root/reference/src/starkpil, e.g.
starks.cpp:149-183; the submodule itself is not checked out in the snapshot).
All functions are elementwise over arbitrary array shapes and jit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Field modulus p = 2^64 - 2^32 + 1 = 0xFFFFFFFF00000001
P = (1 << 64) - (1 << 32) + 1
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
EPSILON = np.uint32(0xFFFFFFFF)  # 2^32 - 1 == 2^64 mod p

# Multiplicative group generator (order p-1); also the LDE coset shift used by
# the reference prover ("Goldilocks::shift()").
GENERATOR = 7
SHIFT = 7
# 2-adicity: p - 1 = 2^32 * (2^32 - 1)
TWO_ADICITY = 32

MASK16 = np.uint32(0xFFFF)
U32_DTYPE = jnp.uint32


def _u32(x):
    return jnp.asarray(x, dtype=U32_DTYPE)


# ---------------------------------------------------------------------------
# Host-side scalar helpers (Python ints, exact) — used to build constant
# tables (roots of unity, round constants, twiddles) bit-exactly.
# ---------------------------------------------------------------------------

def host_mul(a: int, b: int) -> int:
    return (a * b) % P


def host_add(a: int, b: int) -> int:
    return (a + b) % P


def host_exp(a: int, e: int) -> int:
    return pow(a, e, P)


def host_inv(a: int) -> int:
    return pow(a, P - 2, P)


@functools.lru_cache(maxsize=None)
def host_w(nbits: int) -> int:
    """2^nbits-th primitive root of unity (Goldilocks::w(nbits))."""
    assert 0 <= nbits <= TWO_ADICITY
    return pow(GENERATOR, (P - 1) >> nbits, P)


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def from_u64_np(x: np.ndarray):
    """numpy uint64 (or python-int array) -> (lo, hi) uint32 device pair."""
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return _u32(lo), _u32(hi)


def from_int_list(vals):
    """List/array of python ints (already reduced mod p) -> pair."""
    arr = np.array([int(v) % P for v in np.asarray(vals, dtype=object).ravel()],
                   dtype=np.uint64).reshape(np.shape(vals))
    return from_u64_np(arr)


def to_u64_np(a) -> np.ndarray:
    lo, hi = a
    lo = np.asarray(jax.device_get(lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def to_int_list(a):
    return [int(v) for v in to_u64_np(a).ravel()]


def zeros(shape):
    z = jnp.zeros(shape, dtype=U32_DTYPE)
    return z, z


def ones(shape):
    return jnp.ones(shape, dtype=U32_DTYPE), jnp.zeros(shape, dtype=U32_DTYPE)


def full(shape, value: int):
    value %= P
    lo = jnp.full(shape, np.uint32(value & 0xFFFFFFFF), dtype=U32_DTYPE)
    hi = jnp.full(shape, np.uint32(value >> 32), dtype=U32_DTYPE)
    return lo, hi


# ---------------------------------------------------------------------------
# 64-bit limb primitives (uint32 pairs)
# ---------------------------------------------------------------------------

def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out (as uint32 0/1)."""
    lo = alo + blo
    c0 = (lo < alo).astype(U32_DTYPE)
    hi0 = ahi + bhi
    c1 = (hi0 < ahi).astype(U32_DTYPE)
    hi = hi0 + c0
    c2 = (hi < c0).astype(U32_DTYPE)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out (as uint32 0/1)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32_DTYPE)
    hi0 = ahi - bhi
    b1 = (ahi < bhi).astype(U32_DTYPE)
    hi = hi0 - b0
    b2 = (hi0 < b0).astype(U32_DTYPE)
    return lo, hi, b1 | b2


def _geq_p(lo, hi):
    return (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))


def _cond_sub_p(lo, hi):
    """Subtract p once if value >= p (value < 2^64 assumed)."""
    slo, shi, _ = _sub64(lo, hi, P_LO, P_HI)
    take = _geq_p(lo, hi)
    return jnp.where(take, slo, lo), jnp.where(take, shi, hi)


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------

def add(a, b):
    alo, ahi = a
    blo, bhi = b
    lo, hi, carry = _add64(alo, ahi, blo, bhi)
    # 2^64 ≡ EPSILON: on carry, add EPSILON (cannot overflow again; see tests)
    lo2 = lo + EPSILON
    c2 = (lo2 < lo).astype(U32_DTYPE)
    hi2 = hi + c2
    lo = jnp.where(carry.astype(bool), lo2, lo)
    hi = jnp.where(carry.astype(bool), hi2, hi)
    return _cond_sub_p(lo, hi)


def sub(a, b):
    alo, ahi = a
    blo, bhi = b
    lo, hi, borrow = _sub64(alo, ahi, blo, bhi)
    # -2^64 ≡ -EPSILON: on borrow, subtract EPSILON (wrapping)
    lo2 = lo - EPSILON
    b2 = (lo < EPSILON).astype(U32_DTYPE)
    hi2 = hi - b2
    lo = jnp.where(borrow.astype(bool), lo2, lo)
    hi = jnp.where(borrow.astype(bool), hi2, hi)
    return _cond_sub_p(lo, hi)


def neg(a):
    lo, hi = a
    slo, shi, _ = _sub64(P_LO, P_HI, lo, hi)
    is_zero = (lo == 0) & (hi == 0)
    return jnp.where(is_zero, lo, slo), jnp.where(is_zero, hi, shi)


def _mul_wide(a, b):
    """Full 64x64 -> 128-bit product as four uint32 limbs (n0..n3)."""
    alo, ahi = a
    blo, bhi = b
    # 16-bit limbs
    a_l = [alo & MASK16, alo >> 16, ahi & MASK16, ahi >> 16]
    b_l = [blo & MASK16, blo >> 16, bhi & MASK16, bhi >> 16]
    # Products (exact in uint32) split into 16-bit halves
    plo = [[None] * 4 for _ in range(4)]
    phi = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            p = a_l[i] * b_l[j]
            plo[i][j] = p & MASK16
            phi[i][j] = p >> 16
    # Column sums (max 7 terms of 16-bit values -> fits uint32), then carry
    digits = []
    carry = jnp.zeros_like(alo)
    for k in range(8):
        col = carry
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                col = col + plo[i][j]
            j = k - 1 - i
            if 0 <= j < 4:
                col = col + phi[i][j]
        digits.append(col & MASK16)
        carry = col >> 16
    n0 = digits[0] | (digits[1] << 16)
    n1 = digits[2] | (digits[3] << 16)
    n2 = digits[4] | (digits[5] << 16)
    n3 = digits[6] | (digits[7] << 16)
    return n0, n1, n2, n3


def _reduce128(n0, n1, n2, n3):
    """Reduce n3·2^96 + n2·2^64 + n1·2^32 + n0 mod p (canonical output).

    Uses 2^96 ≡ -1 and 2^64 ≡ 2^32 - 1 (mod p).
    """
    # t0 = lo64 - n3  (on borrow, wrap-sub EPSILON)
    lo, hi, borrow = _sub64(n0, n1, n3, jnp.zeros_like(n3))
    lo2 = lo - EPSILON
    b2 = (lo < EPSILON).astype(U32_DTYPE)
    hi2 = hi - b2
    lo = jnp.where(borrow.astype(bool), lo2, lo)
    hi = jnp.where(borrow.astype(bool), hi2, hi)
    # t1 = n2 * EPSILON = (n2 << 32) - n2
    nz = (n2 != 0).astype(U32_DTYPE)
    t1_lo = jnp.zeros_like(n2) - n2
    t1_hi = n2 - nz
    # t2 = t0 + t1 (on carry, wrap-add EPSILON)
    lo, hi, carry = _add64(lo, hi, t1_lo, t1_hi)
    lo2 = lo + EPSILON
    c2 = (lo2 < lo).astype(U32_DTYPE)
    hi2 = hi + c2
    lo = jnp.where(carry.astype(bool), lo2, lo)
    hi = jnp.where(carry.astype(bool), hi2, hi)
    return _cond_sub_p(lo, hi)


def mul(a, b):
    return _reduce128(*_mul_wide(a, b))


def sqr(a):
    return mul(a, a)


def mul_const(a, c: int):
    """Multiply by a host-known constant (still a full mul; kept for clarity)."""
    c %= P
    lo, hi = a
    clo = jnp.full(lo.shape, np.uint32(c & 0xFFFFFFFF), dtype=U32_DTYPE)
    chi = jnp.full(lo.shape, np.uint32(c >> 32), dtype=U32_DTYPE)
    return mul((lo, hi), (clo, chi))


def exp_const(a, e: int):
    """a ** e for a host-known exponent (fixed square-and-multiply chain)."""
    e %= (P - 1)
    if e == 0:
        return ones(a[0].shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def inv(a):
    """Fermat inverse a^(p-2). inv(0) = 0 by convention."""
    r = exp_const(a, P - 2)
    is_zero = (a[0] == 0) & (a[1] == 0)
    return jnp.where(is_zero, 0, r[0]), jnp.where(is_zero, 0, r[1])


def batch_inv(a, axis=0):
    """Montgomery batch inversion along `axis` via two parallel scans.

    inv(a_i) = prefix_{i-1} * suffix_{i+1} * inv(total); zeros map to zero.
    Equivalent of Polinomial::batchInverseParallel (polinomial.hpp).
    """
    lo, hi = a
    is_zero = (lo == 0) & (hi == 0)
    lo = jnp.where(is_zero, 1, lo)
    hi = jnp.where(is_zero, 0, hi)

    def combine(x, y):
        return mul(x, y)

    pre = jax.lax.associative_scan(combine, (lo, hi), axis=axis)
    suf = jax.lax.associative_scan(combine, (jnp.flip(lo, axis=axis), jnp.flip(hi, axis=axis)), axis=axis)
    suf = (jnp.flip(suf[0], axis=axis), jnp.flip(suf[1], axis=axis))

    n = lo.shape[axis]
    total = (jax.lax.index_in_dim(pre[0], n - 1, axis=axis, keepdims=True),
             jax.lax.index_in_dim(pre[1], n - 1, axis=axis, keepdims=True))
    inv_total = inv(total)

    # prefix exclusive: shift pre right by one, pad with 1
    one_shape = list(lo.shape)
    one_shape[axis] = 1
    one_blk = ones(tuple(one_shape))
    pre_excl = (jnp.concatenate([one_blk[0], jax.lax.slice_in_dim(pre[0], 0, n - 1, axis=axis)], axis=axis),
                jnp.concatenate([one_blk[1], jax.lax.slice_in_dim(pre[1], 0, n - 1, axis=axis)], axis=axis))
    suf_excl = (jnp.concatenate([jax.lax.slice_in_dim(suf[0], 1, n, axis=axis), one_blk[0]], axis=axis),
                jnp.concatenate([jax.lax.slice_in_dim(suf[1], 1, n, axis=axis), one_blk[1]], axis=axis))

    out = mul(mul(pre_excl, suf_excl), inv_total)
    return jnp.where(is_zero, 0, out[0]), jnp.where(is_zero, 0, out[1])


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a):
    return (a[0] == 0) & (a[1] == 0)


def select(pred, a, b):
    """where(pred, a, b) elementwise on pairs."""
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


# ---------------------------------------------------------------------------
# Structural helpers
# ---------------------------------------------------------------------------

def reshape(a, shape):
    return a[0].reshape(shape), a[1].reshape(shape)


def take(a, idx, axis=0):
    return jnp.take(a[0], idx, axis=axis), jnp.take(a[1], idx, axis=axis)


def concat(pairs, axis=0):
    return (jnp.concatenate([p[0] for p in pairs], axis=axis),
            jnp.concatenate([p[1] for p in pairs], axis=axis))


def stack(pairs, axis=0):
    return (jnp.stack([p[0] for p in pairs], axis=axis),
            jnp.stack([p[1] for p in pairs], axis=axis))


def transpose(a, axes):
    return jnp.transpose(a[0], axes), jnp.transpose(a[1], axes)


def slice_cols(a, start, stop, axis=-1):
    idx = [slice(None)] * a[0].ndim
    idx[axis] = slice(start, stop)
    idx = tuple(idx)
    return a[0][idx], a[1][idx]


def powers(base: int, n: int, start: int = 1):
    """Host-computed table [start, start*base, ..., start*base^(n-1)] as a pair."""
    vals = np.empty(n, dtype=np.uint64)
    cur = start % P
    b = base % P
    for i in range(n):
        vals[i] = cur
        cur = (cur * b) % P
    return from_u64_np(vals)
