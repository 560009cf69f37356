"""Goldilocks NTT / INTT / low-degree extension, TPU-native.

Equivalent of the reference's ``NTT_Goldilocks::{NTT,INTT,extendPol}``
(used at /root/reference/src/starkpil/starks.cpp:53,262,285,326).

Layout: polynomials are (N, C) column batches (N rows = domain, C columns).
C is small (3-700 but typically 4-16 per call), so the transform works in a
TRANSPOSED (C, N) layout internally: TPU vector lanes run along the minor
axis, and (N, C) butterflies would populate only C of 128 lanes.

Structure (two phases, one relayout in the middle — the four-step NTT
shape, radix-4 DIF butterflies throughout):

  * phase 1 runs DIF stages in (C, blocks, 4, h) views while the
    intra-block half h is lane-sized (>= 128);
  * once h gets small, the remaining per-block m-point transforms relayout
    to (C, m, blocks) so the untouched block axis carries the lanes for
    every remaining stage;
  * the output bit-reversal factors into two independent axis-local
    permutations of that (m, blocks) view — the natural-order result is a
    straight reshape, no global gather.

Twiddle tables are numpy-exact (u64 split arithmetic), host-cached per
domain size.

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

# Phase-1 keeps running while the butterfly half h stays at least this many
# lanes wide; below it, phase 2's block-axis layout takes over.
_H_MIN = 128


def _np_modmul(a: np.ndarray, b) -> np.ndarray:
    """Exact (a * b) % P on uint64 numpy arrays (wrapping split arithmetic,
    mirrors gl._mul_wide/_reduce128)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    mask = np.uint64(0xFFFFFFFF)
    eps = np.uint64(0xFFFFFFFF)
    thirty_two = np.uint64(32)
    a_lo = a & mask
    a_hi = a >> thirty_two
    b_lo = b & mask
    b_hi = b >> thirty_two
    with np.errstate(over="ignore"):
        ll = a_lo * b_lo
        lh = a_lo * b_hi
        hl = a_hi * b_lo
        hh = a_hi * b_hi
        lo = a * b
        t = hl + (ll >> thirty_two)
        u = lh + (t & mask)
        hi = hh + (t >> thirty_two) + (u >> thirty_two)
        hi_hi = hi >> thirty_two
        hi_lo = hi & mask
        t0 = lo - hi_hi
        t0 = np.where(lo < hi_hi, t0 - eps, t0)
        t1 = hi_lo * eps
        r = t0 + t1
        r = np.where(r < t0, r + eps, r)
    return np.where(r >= np.uint64(P), r - np.uint64(P), r)


def _np_pow_table(base: int, count: int) -> np.ndarray:
    """[base^k for k < count] as uint64, exact, log(count) numpy passes."""
    out = np.ones(1, dtype=np.uint64)
    step = np.uint64(base % P)
    while out.size < count:
        take = min(out.size, count - out.size)
        out = np.concatenate([out, _np_modmul(out[:take], step)])
        step = _np_modmul(step, step)
    return out


@functools.lru_cache(maxsize=None)
def _twiddles(nbits: int, inverse: bool):
    """Per-stage DIF twiddle tables; tws[s][j] = w^(j * 2^s), so every
    stage is a stride of the stage-0 table."""
    n = 1 << nbits
    w = gl.host_w(nbits)
    if inverse:
        w = gl.host_inv(w)
    base = _np_pow_table(w, max(n // 2, 1))
    return [base[:: 1 << s][: n >> (s + 1)] for s in range(nbits)]


@functools.lru_cache(maxsize=None)
def _bitrev(nbits: int):
    n = 1 << nbits
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(nbits):
        rev |= ((idx >> b) & 1).astype(np.int32) << (nbits - 1 - b)
    return rev


def _radix4(p0, p1, p2, p3, tw1a, tw1b, tw2):
    """Two fused DIF levels: one HBM pass instead of two."""
    u0 = gl.add(p0, p2)
    u1 = gl.add(p1, p3)
    v0 = gl.mul(gl.sub(p0, p2), tw1a)
    v1 = gl.mul(gl.sub(p1, p3), tw1b)
    y0 = gl.add(u0, u1)
    y1 = gl.mul(gl.sub(u0, u1), tw2)
    y2 = gl.add(v0, v1)
    y3 = gl.mul(gl.sub(v0, v1), tw2)
    return y0, y1, y2, y3


@functools.partial(jax.jit, static_argnums=(1, 2))
def _transform(a, nbits: int, inverse: bool):
    """Radix-4 DIF over axis 0 of an (N, C) array; output natural order."""
    n = 1 << nbits
    assert a.shape[0] == n
    squeeze = False
    if a.ndim == 1:
        a = a[:, None]
        squeeze = True
    c = a.shape[1]
    tws = _twiddles(nbits, inverse)
    at = a.T                              # (c, n): lanes along the domain

    # -- phase 1: intra-block half h carries the lanes --------------------
    s = 0
    while s + 1 < nbits and (n >> (s + 2)) >= _H_MIN:
        h = n >> (s + 2)
        x = at.reshape(c, 1 << s, 4, h)
        y0, y1, y2, y3 = _radix4(
            x[:, :, 0], x[:, :, 1], x[:, :, 2], x[:, :, 3],
            tws[s][None, None, :h], tws[s][None, None, h:],
            tws[s + 1][None, None, :])
        at = jnp.stack([y0, y1, y2, y3], axis=2).reshape(c, n)
        s += 2

    # -- phase 2: the untouched block axis carries the lanes --------------
    mbits = nbits - s
    if mbits > 0 and s > 0:
        m = 1 << mbits
        blocks = 1 << s
        x = at.reshape(c, blocks, m).transpose(0, 2, 1)   # (c, m, blocks)
        t = 0
        while t + 1 < mbits:
            hh = m >> (t + 2)
            xx = x.reshape(c, 1 << t, 4, hh, blocks)
            g = s + t
            y0, y1, y2, y3 = _radix4(
                xx[:, :, 0], xx[:, :, 1], xx[:, :, 2], xx[:, :, 3],
                tws[g][None, None, :hh, None], tws[g][None, None, hh:, None],
                tws[g + 1][None, None, :, None])
            x = jnp.stack([y0, y1, y2, y3], axis=2).reshape(c, m, blocks)
            t += 2
        if t < mbits:                     # odd tail: one radix-2 stage
            hh = m >> (t + 1)
            xx = x.reshape(c, 1 << t, 2, hh, blocks)
            ev, od = xx[:, :, 0], xx[:, :, 1]
            top = gl.add(ev, od)
            bot = gl.mul(gl.sub(ev, od), tws[s + t][None, None, :, None])
            x = jnp.stack([top, bot], axis=2).reshape(c, m, blocks)
        # The global bit-reversal rev(b||j) = rev(j)||rev(b) factors into
        # independent axis permutations of this (m, blocks) view; reading
        # the permuted array as (m major, blocks minor) IS natural order.
        x = jnp.take(x, jnp.asarray(_bitrev(mbits)), axis=1)
        x = jnp.take(x, jnp.asarray(_bitrev(s)), axis=2)
        at = x.reshape(c, n)
    else:
        # tiny n (phase 1 never split) or nothing left: finish in the
        # phase-1 layout and bit-reverse globally.
        t = s
        while t + 1 < nbits:
            h = n >> (t + 2)
            x = at.reshape(c, 1 << t, 4, h)
            y0, y1, y2, y3 = _radix4(
                x[:, :, 0], x[:, :, 1], x[:, :, 2], x[:, :, 3],
                tws[t][None, None, :h], tws[t][None, None, h:],
                tws[t + 1][None, None, :])
            at = jnp.stack([y0, y1, y2, y3], axis=2).reshape(c, n)
            t += 2
        if t < nbits:
            h = n >> (t + 1)
            x = at.reshape(c, 1 << t, 2, h)
            ev, od = x[:, :, 0], x[:, :, 1]
            top = gl.add(ev, od)
            bot = gl.mul(gl.sub(ev, od), tws[t][None, None, :])
            at = jnp.stack([top, bot], axis=2).reshape(c, n)
        at = jnp.take(at, jnp.asarray(_bitrev(nbits)), axis=1)

    if inverse:
        at = gl.mul_const(at, gl.host_inv(n))
    a = at.T
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


def extend_pol_np(a_np: np.ndarray, nbits_ext: int, shift: int = gl.SHIFT,
                  block_cols: int = 64) -> np.ndarray:
    """Streamed LDE: numpy in -> numpy out, `block_cols` columns at a time
    through the jitted transform.  Bounds the device/XLA working set to one
    column block — the HBM/RAM section plan for wide sections (the
    reference reuses buffer regions instead, starks.cpp:102-105)."""
    n, c = a_np.shape
    out = np.empty(((1 << nbits_ext), c), dtype=np.uint64)
    for s in range(0, c, block_cols):
        blk = gl.from_u64_np(np.ascontiguousarray(a_np[:, s:s + block_cols]))
        ext = extend_pol(blk, nbits_ext, shift)
        out[:, s:s + block_cols] = np.asarray(ext, dtype=np.uint64)
        del blk, ext
    return out


def eval_poly_coeffs_at(coeffs_np: np.ndarray, x: int) -> int:
    """Host-exact Horner evaluation of a coefficient array."""
    acc = 0
    for c in reversed([int(v) for v in coeffs_np]):
        acc = (acc * x + c) % P
    return acc
