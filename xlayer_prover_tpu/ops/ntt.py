"""Goldilocks NTT / INTT / low-degree extension, TPU-native.

Equivalent of the reference's ``NTT_Goldilocks::{NTT,INTT,extendPol}``
(used at /root/reference/src/starkpil/starks.cpp:53,262,285,326).

Layout: polynomials are (N, C) column batches (N rows = domain, C columns).
The transform runs log2(N) radix-2 DIF stages as reshaped elementwise
butterflies (XLA fuses the twiddle muls), followed by one bit-reversal
gather to return natural order.  Twiddle tables are host-precomputed exactly
and cached per domain size.

Conventions (matching the reference prover):
  * ``ntt``: evaluations[i] = poly(w^i), natural order, w = gl.host_w(log2 N).
  * ``intt``: inverse transform (scales by N^-1).
  * ``extend_pol``: INTT on N, multiply coeff k by shift^k (shift = 7), then
    NTT on N_ext — evaluations on the shifted coset of the larger domain,
    exactly the reference's LDE semantics.
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
    """Per-stage DIF twiddle tables (numpy u64, host-exact, cached)."""
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
        out.append(tw)
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
    """Radix-2 DIF over axis 0 of an (N, C) array; output natural order."""
    n = 1 << nbits
    assert a.shape[0] == n
    squeeze = False
    if a.ndim == 1:
        a = a[:, None]
        squeeze = True
    c = a.shape[1]
    tws = _twiddles(nbits, inverse)
    # fused radix-4 stages: two butterfly levels per HBM pass
    s = 0
    while s + 1 < nbits:
        h = n >> (s + 2)
        blocks = 1 << s
        x = a.reshape(blocks, 4, h, c)
        p0, p1, p2, p3 = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
        tw1a = tws[s][None, :h, None]
        tw1b = tws[s][None, h:, None]
        tw2 = tws[s + 1][None, :, None]
        u0 = gl.add(p0, p2)
        u1 = gl.add(p1, p3)
        v0 = gl.mul(gl.sub(p0, p2), tw1a)
        v1 = gl.mul(gl.sub(p1, p3), tw1b)
        y0 = gl.add(u0, u1)
        y1 = gl.mul(gl.sub(u0, u1), tw2)
        y2 = gl.add(v0, v1)
        y3 = gl.mul(gl.sub(v0, v1), tw2)
        a = jnp.stack([y0, y1, y2, y3], axis=1).reshape(n, c)
        s += 2
    if s < nbits:                       # odd tail: one radix-2 stage
        h = n >> (s + 1)
        blocks = 1 << s
        x = a.reshape(blocks, 2, h, c)
        ev, od = x[:, 0], x[:, 1]
        top = gl.add(ev, od)
        bot = gl.mul(gl.sub(ev, od), tws[s][None, :, None])
        a = jnp.stack([top, bot], axis=1).reshape(n, c)
    a = jnp.take(a, _bitrev(nbits), axis=0)
    if inverse:
        a = gl.mul_const(a, gl.host_inv(n))
    if squeeze:
        a = a[:, 0]
    return a


def ntt(a, nbits: int | None = None):
    n = a.shape[0]
    nbits = nbits if nbits is not None else n.bit_length() - 1
    assert (1 << nbits) == n
    return _transform(a, nbits, False)


def intt(a, nbits: int | None = None):
    n = a.shape[0]
    nbits = nbits if nbits is not None else n.bit_length() - 1
    assert (1 << nbits) == n
    return _transform(a, nbits, True)


def coset_shift_coeffs(coeffs, shift: int = gl.SHIFT):
    """Multiply coefficient k by shift^k."""
    n = coeffs.shape[0]
    tbl = gl.powers(shift, n)
    if coeffs.ndim == 2:
        tbl = tbl[:, None]
    return gl.mul(coeffs, tbl)


@functools.partial(jax.jit, static_argnums=(1, 2))
def extend_pol(a, nbits_ext: int, shift: int = gl.SHIFT):
    """LDE: values on size-N domain -> values on shift-coset of N_ext domain.

    Matches NTT_Goldilocks::extendPol semantics (starks.cpp:53-60): row i of
    the output is poly(shift * w_ext^i).
    """
    n = a.shape[0]
    nbits = n.bit_length() - 1
    assert (1 << nbits) == n and nbits_ext >= nbits
    coeffs = coset_shift_coeffs(intt(a, nbits), shift)
    pad = [(0, (1 << nbits_ext) - n)] + [(0, 0)] * (a.ndim - 1)
    return ntt(jnp.pad(coeffs, pad), nbits_ext)


def eval_poly_coeffs_at(coeffs_np: np.ndarray, x: int) -> int:
    """Host-exact Horner evaluation of a coefficient array."""
    acc = 0
    for c in reversed([int(v) for v in coeffs_np]):
        acc = (acc * x + c) % P
    return acc
