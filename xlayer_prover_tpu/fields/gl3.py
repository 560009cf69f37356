"""Cubic extension of Goldilocks: F_p[x] / (x^3 - x - 1).

TPU-native equivalent of the reference's ``Goldilocks3`` (challenges, grand
products and the FRI polynomial are all degree-3; e.g. starks.cpp:301-391,
friProve.cpp:85-108).  Elements are triples ``(c0, c1, c2)`` of uint64
arrays (see fields.gl).  Inversion uses the Frobenius/norm method with
host-precomputed matrices for a -> a^p and a -> a^(p^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import gl

P = gl.P


# ---------------------------------------------------------------------------
# Host-side exact helpers: polynomial arithmetic mod x^3 - x - 1
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


def _host_inv3(a):
    """Inverse via norm: a^-1 = a^(p+p^2) / N(a)."""
    f1, f2 = _frobenius_matrices()

    def apply(mat, v):
        out = [0, 0, 0]
        for i in range(3):
            for k in range(3):
                out[k] = (out[k] + v[i] * mat[i][k]) % P
        return out

    ap = apply(f1, a)
    ap2 = apply(f2, a)
    t = _host_mul3(ap, ap2)
    n = _host_mul3(a, t)[0]
    n_inv = pow(n, P - 2, P)
    return [(c * n_inv) % P for c in t]


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
    z = jnp.zeros_like(a)
    return (a, z, z)


def from_ints(c0: int, c1: int, c2: int, shape=()):
    return (gl.full(shape, c0), gl.full(shape, c1), gl.full(shape, c2))


def from_u64_np(arr):
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
    out = []
    for k in range(3):
        acc = None
        for i in range(3):
            c = mat[i][k]
            if c == 0:
                continue
            term = a[i] if c == 1 else gl.mul_const(a[i], c)
            acc = term if acc is None else gl.add(acc, term)
        out.append(acc if acc is not None else jnp.zeros_like(a[0]))
    return tuple(out)


def frobenius(a):
    return _apply_frob(a, _frobenius_matrices()[0])


def inv(a):
    """a^(-1) via norm: inv(a) = a^p * a^(p^2) / N(a), N(a) base field."""
    f1, f2 = _frobenius_matrices()
    ap = _apply_frob(a, f1)
    ap2 = _apply_frob(a, f2)
    t = mul(ap, ap2)
    n = mul(a, t)
    n_inv = gl.inv(n[0])
    return mul_base(t, n_inv)


def batch_inv(a, axis=0):
    is_zero = (a[0] == 0) & (a[1] == 0) & (a[2] == 0)
    one = ones(a[0].shape)
    a = select(is_zero, one, a)
    pre = jax.lax.associative_scan(mul, a, axis=axis)
    flipped = tuple(jnp.flip(c, axis=axis) for c in a)
    suf = jax.lax.associative_scan(mul, flipped, axis=axis)
    suf = tuple(jnp.flip(c, axis=axis) for c in suf)
    n = a[0].shape[axis]
    total = tuple(jax.lax.index_in_dim(c, n - 1, axis=axis, keepdims=True)
                  for c in pre)
    inv_total = inv(total)
    one_shape = list(a[0].shape)
    one_shape[axis] = 1
    one_blk = ones(tuple(one_shape))
    pre_excl = tuple(jnp.concatenate(
        [one_blk[k], jax.lax.slice_in_dim(pre[k], 0, n - 1, axis=axis)],
        axis=axis) for k in range(3))
    suf_excl = tuple(jnp.concatenate(
        [jax.lax.slice_in_dim(suf[k], 1, n, axis=axis), one_blk[k]],
        axis=axis) for k in range(3))
    out = mul(mul(pre_excl, suf_excl), inv_total)
    zero = jnp.uint64(0)
    return tuple(jnp.where(is_zero, zero, c) for c in out)


def select(pred, a, b):
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


def eq(a, b):
    r = None
    for x, y in zip(a, b):
        e = x == y
        r = e if r is None else (r & e)
    return r


def exp_const(a, e: int):
    e %= (P ** 3 - 1)
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


def sum_axis(a, axis=0):
    return tuple(gl.sum_axis(c, axis=axis) for c in a)


def powers_device(x, n: int):
    """[x^k for k < n] for a gl3 scalar x (triple of ()-shaped arrays)."""
    assert n >= 1
    cur = ones((1,))
    mult = tuple(c.reshape(()) for c in x)
    length = 1
    while length < n:
        step = min(length, n - length)
        head = tuple(c[:step] for c in cur)
        scaled = mul(head, mult)
        cur = tuple(jnp.concatenate([c, s]) for c, s in zip(cur, scaled))
        mult = mul(mult, mult)
        length += step
    return cur


# ---------------------------------------------------------------------------
# Structural helpers
# ---------------------------------------------------------------------------

def reshape(a, shape):
    return tuple(c.reshape(shape) for c in a)


def take(a, idx, axis=0):
    return tuple(jnp.take(c, idx, axis=axis) for c in a)


def stack_cols(a):
    """(c0,c1,c2) of shape S -> single array of shape S+(3,)."""
    return jnp.stack(list(a), axis=-1)


def from_cols(arr):
    """Inverse of stack_cols."""
    return tuple(arr[..., k] for k in range(3))
