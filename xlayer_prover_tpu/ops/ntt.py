"""Goldilocks NTT / INTT / low-degree extension, TPU-native.

Equivalent of the reference's ``NTT_Goldilocks::{NTT,INTT,extendPol}``
(used at /root/reference/src/starkpil/starks.cpp:53,262,285,326).

Layout: polynomials are (N, C) column batches (N rows = domain, C columns).
The transform runs log2(N) radix-2 DIF stages as reshaped elementwise
butterflies (XLA fuses the twiddle muls), followed by one bit-reversal
gather to return natural order.  Twiddle tables are host-precomputed exactly
with python ints and cached per domain size.

Conventions (matching the reference prover):
  * ``ntt``: evaluations[i] = poly(w^i), natural order, w = gl.host_w(log2 N).
  * ``intt``: inverse transform (scales by N^-1).
  * ``extend_pol``: INTT on N, multiply coeff k by shift^k (shift = 7), then
    NTT on N_ext — i.e. evaluations on the shifted coset of the larger
    domain, exactly the reference's LDE semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl

P = gl.P


@functools.lru_cache(maxsize=None)
def _twiddles(nbits: int, inverse: bool):
    """Per-stage DIF twiddle tables, host-exact.

    Stage s (s = 0 .. nbits-1) operates on blocks of half-size
    h = N >> (s+1); butterfly: (a, b) -> (a + b, (a - b) * w^(j * 2^s)) for
    j in [0, h), where w is the N-th root (or its inverse).
    """
    n = 1 << nbits
    w = gl.host_w(nbits)
    if inverse:
        w = gl.host_inv(w)
    out = []
    for s in range(nbits):
        h = n >> (s + 1)
        step = pow(w, 1 << s, P)
        tw = np.empty(h, dtype=np.uint64)
        cur = 1
        for j in range(h):
            tw[j] = cur
            cur = (cur * step) % P
        out.append(((tw & 0xFFFFFFFF).astype(np.uint32), (tw >> 32).astype(np.uint32)))
    return out


@functools.lru_cache(maxsize=None)
def _bitrev(nbits: int):
    n = 1 << nbits
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(nbits):
        rev |= ((idx >> b) & 1).astype(np.int32) << (nbits - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(1, 2))
def _transform(a, nbits: int, inverse: bool):
    """Radix-2 DIF over axis 0 of an (N, C) pair; output natural order."""
    lo, hi = a
    n = 1 << nbits
    assert lo.shape[0] == n
    squeeze = False
    if lo.ndim == 1:
        lo, hi = lo[:, None], hi[:, None]
        squeeze = True
    c = lo.shape[1]
    tws = _twiddles(nbits, inverse)
    x = (lo, hi)
    for s in range(nbits):
        h = n >> (s + 1)
        blocks = 1 << s
        # view as (blocks, 2, h, C)
        xl = x[0].reshape(blocks, 2, h, c)
        xh = x[1].reshape(blocks, 2, h, c)
        ev = (xl[:, 0], xh[:, 0])
        od = (xl[:, 1], xh[:, 1])
        top = gl.add(ev, od)
        diff = gl.sub(ev, od)
        twl, twh = tws[s]
        bot = gl.mul(diff, (twl[None, :, None], twh[None, :, None]))
        x = (jnp.stack([top[0], bot[0]], axis=1).reshape(n, c),
             jnp.stack([top[1], bot[1]], axis=1).reshape(n, c))
    # bit-reversal permutation to natural order
    rev = _bitrev(nbits)
    x = gl.take(x, rev, axis=0)
    if inverse:
        n_inv = gl.host_inv(n)
        x = gl.mul_const(x, n_inv)
    if squeeze:
        x = (x[0][:, 0], x[1][:, 0])
    return x


def ntt(a, nbits: int | None = None):
    n = a[0].shape[0]
    nbits = nbits if nbits is not None else n.bit_length() - 1
    assert (1 << nbits) == n
    return _transform(a, nbits, inverse=False)


def intt(a, nbits: int | None = None):
    n = a[0].shape[0]
    nbits = nbits if nbits is not None else n.bit_length() - 1
    assert (1 << nbits) == n
    return _transform(a, nbits, inverse=True)


def coset_shift_coeffs(coeffs, shift: int = gl.SHIFT):
    """Multiply coefficient k by shift^k (host-exact power table)."""
    n = coeffs[0].shape[0]
    tbl = gl.powers(shift, n)
    if coeffs[0].ndim == 2:
        tbl = (tbl[0][:, None], tbl[1][:, None])
    return gl.mul(coeffs, tbl)


@functools.partial(jax.jit, static_argnums=(1, 2))
def extend_pol(a, nbits_ext: int, shift: int = gl.SHIFT):
    """LDE: values on size-N domain -> values on shift-coset of size-N_ext domain.

    Matches NTT_Goldilocks::extendPol semantics (starks.cpp:53-60): the row i
    of the output is poly(shift * w_ext^i).
    """
    n = a[0].shape[0]
    nbits = n.bit_length() - 1
    assert (1 << nbits) == n and nbits_ext >= nbits
    coeffs = intt(a, nbits)
    coeffs = coset_shift_coeffs(coeffs, shift)
    n_ext = 1 << nbits_ext
    pad = [(0, n_ext - n)] + [(0, 0)] * (a[0].ndim - 1)
    padded = (jnp.pad(coeffs[0], pad), jnp.pad(coeffs[1], pad))
    return ntt(padded, nbits_ext)


def eval_poly_coeffs_at(coeffs_np: np.ndarray, x: int) -> int:
    """Host-exact Horner evaluation of coefficient array (python ints)."""
    acc = 0
    for c in reversed([int(v) for v in coeffs_np]):
        acc = (acc * x + c) % P
    return acc
