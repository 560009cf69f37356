"""Pallas TPU kernel: fused Poseidon-Goldilocks permutation.

The XLA path (ops/poseidon_gl.py) materializes round intermediates in HBM
between scan steps; this kernel keeps the whole 30-round permutation in
VMEM — one read of the (batch, 12) states, one write of the outputs, with
round constants and the MDS matrix resident.  Field elements are carried as
uint32 (lo, hi) limb pairs inside the kernel (Mosaic has no 64-bit lanes);
multiplication decomposes into 16-bit half-products (exact in uint32) with
the standard Goldilocks reduction 2^64 ≡ 2^32 - 1, 2^96 ≡ -1.

Used via ``permute(states)``: accepts/returns uint64 (batch, 12) arrays,
splitting/joining at the boundary.  ``interpret=True`` runs on CPU for
tests; on TPU the kernel compiles through Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..fields import gl
from . import poseidon_constants as pc
from .poseidon_gl import _tables

MASK16 = np.uint32(0xFFFF)
EPS = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)

TILE = 256  # states per kernel invocation


def _mul(alo, ahi, blo, bhi):
    """Goldilocks mul on uint32 limb pairs (16-bit half products)."""
    a0 = alo & MASK16
    a1 = alo >> 16
    a2 = ahi & MASK16
    a3 = ahi >> 16
    b0 = blo & MASK16
    b1 = blo >> 16
    b2 = bhi & MASK16
    b3 = bhi >> 16
    # column sums of 16-bit half products (fits uint32: <= 8 * 2^16)
    plo = [[(x * y) & MASK16 for y in (b0, b1, b2, b3)]
           for x in (a0, a1, a2, a3)]
    phi = [[(x * y) >> 16 for y in (b0, b1, b2, b3)]
           for x in (a0, a1, a2, a3)]
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
    # reduce n3*2^96 + n2*2^64 + (n1:n0):  t0 = lo128 - n3 ; t1 = n2 * EPS
    lo = n0 - n3
    borrow = (n0 < n3).astype(jnp.uint32)
    hi = n1 - borrow
    b2_ = (n1 < borrow).astype(jnp.uint32)
    lo2 = lo - EPS
    bw = (lo < EPS).astype(jnp.uint32)
    lo = jnp.where(b2_ == 1, lo2, lo)
    hi = jnp.where(b2_ == 1, hi - bw, hi)
    # t1 = n2 * (2^32 - 1) = (n2 << 32) - n2
    nz = (n2 != 0).astype(jnp.uint32)
    t1_lo = jnp.zeros_like(n2) - n2
    t1_hi = n2 - nz
    # add
    slo = lo + t1_lo
    c0 = (slo < lo).astype(jnp.uint32)
    shi0 = hi + t1_hi
    c1 = (shi0 < hi).astype(jnp.uint32)
    shi = shi0 + c0
    c2 = (shi < c0).astype(jnp.uint32)
    carry_out = c1 | c2
    slo2 = slo + EPS
    cc = (slo2 < slo).astype(jnp.uint32)
    lo = jnp.where(carry_out == 1, slo2, slo)
    hi = jnp.where(carry_out == 1, shi + cc, shi)
    return _cond_sub_p(lo, hi)


def _cond_sub_p(lo, hi):
    geq = (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))
    bb = (lo < P_LO).astype(jnp.uint32)
    return (jnp.where(geq, lo - P_LO, lo),
            jnp.where(geq, hi - P_HI - bb, hi))


def _add(alo, ahi, blo, bhi):
    lo = alo + blo
    c0 = (lo < alo).astype(jnp.uint32)
    hi0 = ahi + bhi
    c1 = (hi0 < ahi).astype(jnp.uint32)
    hi = hi0 + c0
    c2 = (hi < c0).astype(jnp.uint32)
    carry = c1 | c2
    lo2 = lo + EPS
    cc = (lo2 < lo).astype(jnp.uint32)
    lo = jnp.where(carry == 1, lo2, lo)
    hi = jnp.where(carry == 1, hi + cc, hi)
    return _cond_sub_p(lo, hi)


def _sbox(lo, hi):
    l2, h2 = _mul(lo, hi, lo, hi)
    l4, h4 = _mul(l2, h2, l2, h2)
    l6, h6 = _mul(l4, h4, l2, h2)
    return _mul(l6, h6, lo, hi)


def _kernel(state_lo_ref, state_hi_ref, clo_ref, chi_ref, mlo_ref, mhi_ref,
            out_lo_ref, out_hi_ref):
    lo = state_lo_ref[:]        # (TILE, 12)
    hi = state_hi_ref[:]
    n_rounds = pc.FULL_ROUNDS + pc.PARTIAL_ROUNDS
    half = pc.FULL_ROUNDS // 2
    for r in range(n_rounds):
        lo, hi = _add(lo, hi, clo_ref[r][None, :], chi_ref[r][None, :])
        full = r < half or r >= half + pc.PARTIAL_ROUNDS
        if full:
            lo, hi = _sbox(lo, hi)
        else:
            s_lo, s_hi = _sbox(lo[:, 0:1], hi[:, 0:1])
            lo = jnp.concatenate([s_lo, lo[:, 1:]], axis=1)
            hi = jnp.concatenate([s_hi, hi[:, 1:]], axis=1)
        # MDS: out_j = sum_i s_i * M[i][j]
        acc_lo = jnp.zeros_like(lo)
        acc_hi = jnp.zeros_like(hi)
        for i in range(12):
            p_lo, p_hi = _mul(lo[:, i:i + 1], hi[:, i:i + 1],
                              mlo_ref[i][None, :], mhi_ref[i][None, :])
            acc_lo, acc_hi = _add(acc_lo, acc_hi, p_lo, p_hi)
        lo, hi = acc_lo, acc_hi
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


@functools.partial(jax.jit, static_argnums=(1, 2))
def permute(states_u64, interpret: bool = False, tile: int = TILE):
    """(batch, 12) uint64 -> (batch, 12) uint64 via the Pallas kernel."""
    batch = states_u64.shape[0]
    assert batch % tile == 0, f"batch must be a multiple of {tile}"
    TILE = tile
    c_np, m_np, _, _ = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    mlo = jnp.asarray((m_np & 0xFFFFFFFF).astype(np.uint32))
    mhi = jnp.asarray((m_np >> 32).astype(np.uint32))
    slo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    shi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32)

    grid = (batch // TILE,)
    out_lo, out_hi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 12), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 12), lambda i: (i, 0)),
            pl.BlockSpec(clo.shape, lambda i: (0, 0)),
            pl.BlockSpec(chi.shape, lambda i: (0, 0)),
            pl.BlockSpec(mlo.shape, lambda i: (0, 0)),
            pl.BlockSpec(mhi.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 12), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 12), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, 12), jnp.uint32),
            jax.ShapeDtypeStruct((batch, 12), jnp.uint32),
        ],
        interpret=interpret,
    )(slo, shi, clo, chi, mlo, mhi)
    return out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64)
                                        << jnp.uint64(32))
