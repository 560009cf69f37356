"""Goldilocks field arithmetic (p = 2^64 - 2^32 + 1), TPU-native.

Elements are plain ``jnp.uint64`` arrays (canonical, < p).  XLA lowers u64
arithmetic to 32-bit pairs on TPU itself; expressing the field ops at u64
granularity keeps compiled graphs ~8x smaller than hand-split limb code
(which made SPMD compiles explode) while hitting the same VPU instructions.
The 128-bit product needed for reduction is reconstructed from four 32x32
half-products; the reduction uses 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p).

Requires jax_enable_x64 (set at package import).  This is the TPU-native
equivalent of the reference's Goldilocks scalar/AVX library (consumed
throughout /root/reference/src/starkpil, e.g. starks.cpp:149-183).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Field modulus p = 2^64 - 2^32 + 1 = 0xFFFFFFFF00000001
P = (1 << 64) - (1 << 32) + 1
P_U64 = np.uint64(P)
EPSILON = np.uint64(0xFFFFFFFF)          # 2^32 - 1 == 2^64 mod p
MASK32 = np.uint64(0xFFFFFFFF)

# Multiplicative group generator (order p-1); also the LDE coset shift used
# by the reference prover ("Goldilocks::shift()").
GENERATOR = 7
SHIFT = 7
TWO_ADICITY = 32  # p - 1 = 2^32 * (2^32 - 1)

DTYPE = jnp.uint64


# ---------------------------------------------------------------------------
# Host-side scalar helpers (python ints, exact)
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
# Conversions / constructors
# ---------------------------------------------------------------------------

def from_u64_np(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, dtype=np.uint64))


def from_int_list(vals):
    arr = np.array([int(v) % P for v in np.asarray(vals, dtype=object).ravel()],
                   dtype=np.uint64).reshape(np.shape(vals))
    return from_u64_np(arr)


def to_u64_np(a) -> np.ndarray:
    return np.asarray(jax.device_get(a), dtype=np.uint64)


def to_int_list(a):
    return [int(v) for v in to_u64_np(a).ravel()]


def zeros(shape):
    return jnp.zeros(shape, dtype=DTYPE)


def ones(shape):
    return jnp.ones(shape, dtype=DTYPE)


def full(shape, value: int):
    return jnp.full(shape, np.uint64(int(value) % P), dtype=DTYPE)


# ---------------------------------------------------------------------------
# Field ops (elementwise over uint64 arrays)
# ---------------------------------------------------------------------------

def _cond_sub_p(x):
    return jnp.where(x >= P_U64, x - P_U64, x)


def add(a, b):
    s = a + b                        # wraps mod 2^64
    carried = s < a                  # wrapped iff sum < either operand
    s = jnp.where(carried, s + EPSILON, s)
    return _cond_sub_p(s)


def sub(a, b):
    d = a - b
    borrowed = a < b
    d = jnp.where(borrowed, d - EPSILON, d)
    return _cond_sub_p(d)


def neg(a):
    return jnp.where(a == 0, a, P_U64 - a)


def _mul_wide(a, b):
    """Full 64x64 -> (lo64, hi64) via four 32-bit half products."""
    a_lo = a & MASK32
    a_hi = a >> np.uint64(32)
    b_lo = b & MASK32
    b_hi = b >> np.uint64(32)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    lo = a * b                       # wrapping low 64
    t = hl + (ll >> np.uint64(32))   # < 2^64
    u = lh + (t & MASK32)            # < 2^64
    hi = hh + (t >> np.uint64(32)) + (u >> np.uint64(32))
    return lo, hi


def _reduce128(lo, hi):
    """Reduce hi*2^64 + lo mod p (canonical). plonky2-style branchless."""
    hi_hi = hi >> np.uint64(32)
    hi_lo = hi & MASK32
    t0 = lo - hi_hi
    t0 = jnp.where(lo < hi_hi, t0 - EPSILON, t0)   # wrapping borrow fix
    t1 = hi_lo * EPSILON
    r = t0 + t1
    r = jnp.where(r < t0, r + EPSILON, r)          # wrapping carry fix
    return _cond_sub_p(r)


def mul(a, b):
    return _reduce128(*_mul_wide(a, b))


def sqr(a):
    return mul(a, a)


def mul_const(a, c: int):
    c = int(c) % P
    return mul(a, jnp.asarray(np.uint64(c)))


def exp_const(a, e: int):
    """a ** e for a host-known exponent (unrolled square-and-multiply)."""
    e %= (P - 1)
    if e == 0:
        return jnp.ones_like(a)
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
    """Fermat inverse a^(p-2) via a lax.scan over exponent bits (keeps the
    compiled graph one multiply deep). inv(0) = 0 by convention."""
    e = P - 2
    bits = np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=bool)

    def body(carry, bit):
        acc, base = carry
        acc = jnp.where(bit, mul(acc, base), acc)
        return (acc, sqr(base)), None

    acc0 = (a ^ a) + np.uint64(1)   # ones inheriting a's sharding/vma
    (r, _), _ = jax.lax.scan(body, (acc0, a), jnp.asarray(bits))
    return jnp.where(a == 0, a, r)


def batch_inv(a, axis=0):
    """Montgomery batch inversion via two parallel scans; zeros -> zero."""
    is_zero = a == 0
    a = jnp.where(is_zero, jnp.uint64(1), a)
    pre = jax.lax.associative_scan(mul, a, axis=axis)
    suf = jnp.flip(jax.lax.associative_scan(
        mul, jnp.flip(a, axis=axis), axis=axis), axis=axis)
    n = a.shape[axis]
    total = jax.lax.index_in_dim(pre, n - 1, axis=axis, keepdims=True)
    inv_total = inv(total)
    one_shape = list(a.shape)
    one_shape[axis] = 1
    one_blk = jnp.ones(one_shape, dtype=DTYPE)
    pre_excl = jnp.concatenate(
        [one_blk, jax.lax.slice_in_dim(pre, 0, n - 1, axis=axis)], axis=axis)
    suf_excl = jnp.concatenate(
        [jax.lax.slice_in_dim(suf, 1, n, axis=axis), one_blk], axis=axis)
    out = mul(mul(pre_excl, suf_excl), inv_total)
    return jnp.where(is_zero, jnp.uint64(0), out)


def sum_axis(a, axis=0):
    """Modular sum along `axis` via halving tree reduction."""
    n = a.shape[axis]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    if m != n:
        padcfg = [(0, 0)] * a.ndim
        padcfg[axis] = (0, m - n)
        a = jnp.pad(a, padcfg)
    while m > 1:
        m //= 2
        a = add(jax.lax.slice_in_dim(a, 0, m, axis=axis),
                jax.lax.slice_in_dim(a, m, 2 * m, axis=axis))
    return jnp.squeeze(a, axis=axis)


def powers_device(base: int, n: int, start: int = 1):
    """[start * base^k for k < n] built on device by doubling (log n muls)."""
    assert n >= 1
    cur = full((1,), start)
    length = 1
    b_pow = int(base) % P
    while length < n:
        step = min(length, n - length)
        cur = jnp.concatenate([cur, mul_const(cur[:step], b_pow)])
        b_pow = (b_pow * b_pow) % P
        length += step
    return cur


def powers(base: int, n: int, start: int = 1):
    """Host-exact power table as a device array, log(n) doubling passes.

    The old per-element Python loop was 8.4M scalar modmuls at n=2^23 —
    ~15 min of silent spin inside the first extend_pol trace at the
    reference geometry (observed r5; it masqueraded as a tunnel stall)."""
    from . import glh
    cur = np.array([start % P], dtype=np.uint64)
    step = np.uint64((base % P))
    while cur.size < n:
        take = min(cur.size, n - cur.size)
        cur = np.concatenate([cur, glh.mul(cur[:take], step)])
        step = glh.mul(step, step)
    return from_u64_np(cur[:n])
