"""Cubic extension of Goldilocks: F_p[x] / (x^3 - x - 1).

TPU-native equivalent of the reference's ``Goldilocks3`` (consumed throughout
/root/reference/src/starkpil: challenges, grand products, FRI polynomial are
all degree-3; e.g. starks.cpp:301-391, friProve.cpp:85-108).

Elements are triples ``(c0, c1, c2)`` of base-field pairs (see fields.gl).
Inversion uses the Frobenius/norm method with host-precomputed matrices for
the linear maps a -> a^p and a -> a^(p^2), so a vector inverse costs two 3x3
constant matrix products, two extension muls and one base-field inverse.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import gl

P = gl.P


# ---------------------------------------------------------------------------
# Host-side exact helpers (python ints): polynomial arithmetic mod x^3 - x - 1
# ---------------------------------------------------------------------------

def _host_mul3(a, b):
    d = [0] * 5
    for i in range(3):
        for j in range(3):
            d[i + j] = (d[i + j] + a[i] * b[j]) % P
    # x^3 = x + 1 ; x^4 = x^2 + x
    return [(d[0] + d[3]) % P, (d[1] + d[3] + d[4]) % P, (d[2] + d[4]) % P]


def _host_pow3(a, e: int):
    r = [1, 0, 0]
    base = list(a)
    while e:
        if e & 1:
            r = _host_mul3(r, base)
        base = _host_mul3(base, base)
        e >>= 1
    return r


@functools.lru_cache(maxsize=None)
def _frobenius_matrices():
    """Rows i of F1/F2 = coefficients of x^(i*p) / x^(i*p^2) mod (x^3-x-1)."""
    xp = _host_pow3([0, 1, 0], P)
    xp2 = _host_pow3([0, 1, 0], P * P)
    f1 = [[1, 0, 0], xp, _host_mul3(xp, xp)]
    f2 = [[1, 0, 0], xp2, _host_mul3(xp2, xp2)]
    return f1, f2


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def zeros(shape):
    return tuple(gl.zeros(shape) for _ in range(3))


def ones(shape):
    return (gl.ones(shape), gl.zeros(shape), gl.zeros(shape))


def from_base(a):
    """Embed a base-field pair as (a, 0, 0)."""
    z = gl.zeros(a[0].shape)
    return (a, z, z)


def from_ints(c0: int, c1: int, c2: int, shape=()):
    return (gl.full(shape, c0), gl.full(shape, c1), gl.full(shape, c2))


def from_u64_np(arr):
    """numpy uint64 array with trailing dim 3 -> gl3 element."""
    arr = np.asarray(arr, dtype=np.uint64)
    assert arr.shape[-1] == 3
    return tuple(gl.from_u64_np(arr[..., k]) for k in range(3))


def to_u64_np(a):
    return np.stack([gl.to_u64_np(c) for c in a], axis=-1)


# ---------------------------------------------------------------------------
# Arithmetic
# ---------------------------------------------------------------------------

def add(a, b):
    return tuple(gl.add(x, y) for x, y in zip(a, b))


def sub(a, b):
    return tuple(gl.sub(x, y) for x, y in zip(a, b))


def neg(a):
    return tuple(gl.neg(x) for x in a)


def add_base(a, b):
    return (gl.add(a[0], b), a[1], a[2])


def sub_base(a, b):
    return (gl.sub(a[0], b), a[1], a[2])


def base_sub(b, a):
    """b - a with b in the base field, a in the extension."""
    return (gl.sub(b, a[0]), gl.neg(a[1]), gl.neg(a[2]))


def mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    d0 = gl.mul(a0, b0)
    d1 = gl.add(gl.mul(a0, b1), gl.mul(a1, b0))
    d2 = gl.add(gl.add(gl.mul(a0, b2), gl.mul(a1, b1)), gl.mul(a2, b0))
    d3 = gl.add(gl.mul(a1, b2), gl.mul(a2, b1))
    d4 = gl.mul(a2, b2)
    # x^3 = x + 1 ; x^4 = x^2 + x
    return (gl.add(d0, d3), gl.add(d1, gl.add(d3, d4)), gl.add(d2, d4))


def mul_base(a, b):
    return tuple(gl.mul(c, b) for c in a)


def sqr(a):
    return mul(a, a)


def _apply_frob(a, mat):
    """Linear map with host-constant 3x3 matrix of field scalars."""
    out = []
    for k in range(3):
        acc = None
        for i in range(3):
            c = mat[i][k]
            if c == 0:
                continue
            term = a[i] if c == 1 else gl.mul_const(a[i], c)
            acc = term if acc is None else gl.add(acc, term)
        out.append(acc if acc is not None else gl.zeros(a[0][0].shape))
    return tuple(out)


def frobenius(a):
    f1, _ = _frobenius_matrices()
    return _apply_frob(a, f1)


def inv(a):
    """a^(-1) via norm: inv(a) = a^p * a^(p^2) / N(a), N(a) in the base field."""
    f1, f2 = _frobenius_matrices()
    ap = _apply_frob(a, f1)
    ap2 = _apply_frob(a, f2)
    t = mul(ap, ap2)              # a^(p + p^2)
    n = mul(a, t)                 # norm: lands in base field (c1 = c2 = 0)
    n_inv = gl.inv(n[0])
    return mul_base(t, n_inv)


def batch_inv(a, axis=0):
    """Montgomery batch inversion over the extension field."""
    import jax

    is_zero = (a[0][0] == 0) & (a[0][1] == 0) & (a[1][0] == 0) & (a[1][1] == 0) \
        & (a[2][0] == 0) & (a[2][1] == 0)
    one = ones(a[0][0].shape)
    a = select(is_zero, one, a)

    pre = jax.lax.associative_scan(mul, a, axis=axis)
    flipped = tuple((jnp.flip(c[0], axis=axis), jnp.flip(c[1], axis=axis)) for c in a)
    suf = jax.lax.associative_scan(mul, flipped, axis=axis)
    suf = tuple((jnp.flip(c[0], axis=axis), jnp.flip(c[1], axis=axis)) for c in suf)

    n = a[0][0].shape[axis]
    total = tuple((jax.lax.index_in_dim(c[0], n - 1, axis=axis, keepdims=True),
                   jax.lax.index_in_dim(c[1], n - 1, axis=axis, keepdims=True)) for c in pre)
    inv_total = inv(total)

    one_shape = list(a[0][0].shape)
    one_shape[axis] = 1
    one_blk = ones(tuple(one_shape))

    def shift_right(x, fill):
        return tuple(
            (jnp.concatenate([fill[k][0], jax.lax.slice_in_dim(x[k][0], 0, n - 1, axis=axis)], axis=axis),
             jnp.concatenate([fill[k][1], jax.lax.slice_in_dim(x[k][1], 0, n - 1, axis=axis)], axis=axis))
            for k in range(3))

    def shift_left(x, fill):
        return tuple(
            (jnp.concatenate([jax.lax.slice_in_dim(x[k][0], 1, n, axis=axis), fill[k][0]], axis=axis),
             jnp.concatenate([jax.lax.slice_in_dim(x[k][1], 1, n, axis=axis), fill[k][1]], axis=axis))
            for k in range(3))

    pre_excl = shift_right(pre, one_blk)
    suf_excl = shift_left(suf, one_blk)
    out = mul(mul(pre_excl, suf_excl), inv_total)
    zero = zeros(a[0][0].shape)
    return select(is_zero, zero, out)


def select(pred, a, b):
    return tuple((jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1]))
                 for x, y in zip(a, b))


def eq(a, b):
    r = None
    for x, y in zip(a, b):
        e = gl.eq(x, y)
        r = e if r is None else (r & e)
    return r


def exp_const(a, e: int):
    e %= (P ** 3 - 1)
    if e == 0:
        return ones(a[0][0].shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


# ---------------------------------------------------------------------------
# Structural helpers
# ---------------------------------------------------------------------------

def reshape(a, shape):
    return tuple(gl.reshape(c, shape) for c in a)


def take(a, idx, axis=0):
    return tuple(gl.take(c, idx, axis=axis) for c in a)


def stack_cols(a):
    """(c0,c1,c2) of shape S -> base-pair of shape S+(3,) (interleaved dims)."""
    return (jnp.stack([c[0] for c in a], axis=-1),
            jnp.stack([c[1] for c in a], axis=-1))


def from_cols(pair):
    """Inverse of stack_cols."""
    lo, hi = pair
    return tuple((lo[..., k], hi[..., k]) for k in range(3))
