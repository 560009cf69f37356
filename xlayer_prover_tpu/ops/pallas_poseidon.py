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
    return _cond_sub_p(*_mul_nc(alo, ahi, blo, bhi))


def _mul_nc(alo, ahi, blo, bhi):
    """Goldilocks mul on uint32 limb pairs (16-bit half products).
    Returns a non-canonical representative in [0, 2^64) — exact for ANY
    64-bit inputs (the limb decomposition never assumes < p)."""
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
    return lo, hi


def _sqr_nc(alo, ahi):
    """Goldilocks squaring on uint32 limb pairs: the 4x4 half-product
    matrix is symmetric, so only 10 of 16 products are computed (off-
    diagonal terms doubled) — ~25% fewer VPU multiplies than _mul_nc."""
    a = (alo & MASK16, alo >> 16, ahi & MASK16, ahi >> 16)
    # unique products p[i][j] for i <= j
    plo = {}
    phi = {}
    for i in range(4):
        for j in range(i, 4):
            prod_lo = (a[i] * a[j]) & MASK16
            prod_hi = (a[i] * a[j]) >> 16
            plo[(i, j)] = prod_lo
            phi[(i, j)] = prod_hi
    digits = []
    carry = jnp.zeros_like(alo)
    for k in range(8):
        col = carry
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                key = (min(i, j), max(i, j))
                if i < j:
                    pass            # counted once when i > j
                elif i == j:
                    col = col + plo[key]
                else:
                    col = col + (plo[key] << 1)  # i > j: doubled pair
            j = k - 1 - i
            if 0 <= j < 4:
                key = (min(i, j), max(i, j))
                if i < j:
                    pass
                elif i == j:
                    col = col + phi[key]
                else:
                    col = col + (phi[key] << 1)
        digits.append(col & MASK16)
        carry = col >> 16
    n0 = digits[0] | (digits[1] << 16)
    n1 = digits[2] | (digits[3] << 16)
    n2 = digits[4] | (digits[5] << 16)
    n3 = digits[6] | (digits[7] << 16)
    lo = n0 - n3
    borrow = (n0 < n3).astype(jnp.uint32)
    hi = n1 - borrow
    b2_ = (n1 < borrow).astype(jnp.uint32)
    lo2 = lo - EPS
    bw = (lo < EPS).astype(jnp.uint32)
    lo = jnp.where(b2_ == 1, lo2, lo)
    hi = jnp.where(b2_ == 1, hi - bw, hi)
    nz = (n2 != 0).astype(jnp.uint32)
    t1_lo = jnp.zeros_like(n2) - n2
    t1_hi = n2 - nz
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
    return lo, hi


def _cond_sub_p(lo, hi):
    geq = (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))
    bb = (lo < P_LO).astype(jnp.uint32)
    return (jnp.where(geq, lo - P_LO, lo),
            jnp.where(geq, hi - P_HI - bb, hi))


def _add(alo, ahi, blo, bhi):
    lo, hi = _add_nc(alo, ahi, blo, bhi)
    return _cond_sub_p(lo, hi)


def _add_nc(alo, ahi, blo, bhi):
    """Lazy add: result in [0, 2^64) congruent mod p, NOT canonicalized.
    Sound as long as consumers (the 16-bit-limb mul, the small-MDS plane
    decomposition) accept any 64-bit representative — they do; the
    permutation canonicalizes once at the end."""
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
    return lo, hi


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


# ---------------------------------------------------------------------------
# Pure-jnp u32-pair path (no Mosaic): the same limb arithmetic as the
# kernel, structured as 3 lax.scans (full/partial/full rounds).  TPUs have
# no native u64 lanes, so XLA emulates every u64 op pairwise; carrying
# (lo, hi) u32 planes explicitly with 16-bit half-product multiplication
# avoids that emulation on the hot path.
# ---------------------------------------------------------------------------

def _mds_u32(lo, hi, mlo, mhi):
    acc_lo = acc_hi = None
    for i in range(12):
        p_lo, p_hi = _mul(lo[:, i:i + 1], hi[:, i:i + 1],
                          mlo[i][None, :], mhi[i][None, :])
        if acc_lo is None:
            acc_lo, acc_hi = p_lo, p_hi
        else:
            acc_lo, acc_hi = _add(acc_lo, acc_hi, p_lo, p_hi)
    return acc_lo, acc_hi


@jax.jit
def permute_u32(states_u64):
    """(batch, 12) uint64 -> (batch, 12) uint64, u32-pair arithmetic."""
    c_np, m_np, _, _ = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    mlo = jnp.asarray((m_np & 0xFFFFFFFF).astype(np.uint32))
    mhi = jnp.asarray((m_np >> 32).astype(np.uint32))
    lo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32)
    half = pc.FULL_ROUNDS // 2
    nrp = pc.PARTIAL_ROUNDS

    def full_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][None, :], cr[1][None, :])
        lo, hi = _sbox(lo, hi)
        return _mds_u32(lo, hi, mlo, mhi), None

    def partial_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][None, :], cr[1][None, :])
        s_lo, s_hi = _sbox(lo[:, 0:1], hi[:, 0:1])
        lo = jnp.concatenate([s_lo, lo[:, 1:]], axis=1)
        hi = jnp.concatenate([s_hi, hi[:, 1:]], axis=1)
        return _mds_u32(lo, hi, mlo, mhi), None

    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (clo[:half], chi[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (clo[half:half + nrp], chi[half:half + nrp]))
    st, _ = jax.lax.scan(full_round, st,
                         (clo[half + nrp:], chi[half + nrp:]))
    lo, hi = st
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


# ---------------------------------------------------------------------------
# Small-entry MDS on the VPU: the official Poseidon-GL MDS is circulant
# with entries <= 41 (6 bits), so s_i * M[i][j] fits 16x16-bit products —
# four 16-bit planes of the state, each accumulated over i in uint32
# (12 terms x 22 bits < 2^26, exact), then one carry composition + one
# Goldilocks reduction per output.  ~10x fewer VPU ops than 144 full
# field multiplies.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mds_small_table():
    _c, m_np, _f, _o = _tables()
    assert int(m_np.max()) < (1 << 6), "small-MDS path needs tiny entries"
    return m_np.astype(np.uint32)


def _mds_small(lo, hi):
    m = jnp.asarray(_mds_small_table())            # (12, 12) u32
    a0 = jnp.sum((lo & MASK16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    a1 = jnp.sum((lo >> 16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    a2 = jnp.sum((hi & MASK16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    a3 = jnp.sum((hi >> 16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    n0 = a0 & MASK16
    t1 = (a0 >> 16) + a1
    n1 = t1 & MASK16
    t2 = (t1 >> 16) + a2
    n2 = t2 & MASK16
    t3 = (t2 >> 16) + a3
    n3 = t3 & MASK16
    top = t3 >> 16                                 # 2^64 overflow digit
    lo = n0 | (n1 << 16)
    hi = n2 | (n3 << 16)
    # top * 2^64 ≡ top * (2^32 - 1) = (top << 32) - top
    nz = (top != 0).astype(jnp.uint32)
    return _add(lo, hi, jnp.zeros_like(top) - top, top - nz)


def _sbox_nc(lo, hi):
    # x^7 via the 1,2,4,6,7 chain with the two squarings specialised
    # (symmetric half-product matrix: 10 products instead of 16)
    l2, h2 = _sqr_nc(lo, hi)
    l4, h4 = _sqr_nc(l2, h2)
    l6, h6 = _mul_nc(l4, h4, l2, h2)
    return _mul_nc(l6, h6, lo, hi)


def _compose16_nc(a0, a1, a2, a3):
    """Recombine four u32 sums at 16-bit digit positions into a
    non-canonical (lo, hi) pair (2^64 overflow folded via 2^32 - 1)."""
    n0 = a0 & MASK16
    t1 = (a0 >> 16) + a1
    n1 = t1 & MASK16
    t2 = (t1 >> 16) + a2
    n2 = t2 & MASK16
    t3 = (t2 >> 16) + a3
    n3 = t3 & MASK16
    top = t3 >> 16
    lo = n0 | (n1 << 16)
    hi = n2 | (n3 << 16)
    nz = (top != 0).astype(jnp.uint32)
    return _add_nc(lo, hi, jnp.zeros_like(top) - top, top - nz)


def _mds_small_nc(lo, hi):
    m = jnp.asarray(_mds_small_table())            # (12, 12) u32
    a0 = jnp.sum((lo & MASK16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    a1 = jnp.sum((lo >> 16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    a2 = jnp.sum((hi & MASK16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    a3 = jnp.sum((hi >> 16)[..., :, None] * m, axis=-2, dtype=jnp.uint32)
    return _compose16_nc(a0, a1, a2, a3)


def _mds_small_mxu_nc(lo, hi):
    """MDS on the MXU: state split into eight 8-bit limb planes, ONE f32
    dot against the 6-bit MDS matrix (products <= 255*41, sums over 12
    < 2^18 — exact in f32's 24-bit mantissa), recombined into 16-bit
    digit sums.  Moves the 144-MAC inner loop off the VPU."""
    m = jnp.asarray(_mds_small_table().astype(np.float32))     # (12, 12)
    mask8 = jnp.uint32(0xFF)
    planes = [(lo >> (8 * k)) & mask8 for k in range(4)] + \
             [(hi >> (8 * k)) & mask8 for k in range(4)]
    x = jnp.stack(planes, axis=0).astype(jnp.float32)          # (8, B, 12)
    r = jax.lax.dot_general(x, m, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    r = r.astype(jnp.uint32)                                   # (8, B, 12)
    a0 = r[0] + (r[1] << 8)
    a1 = r[2] + (r[3] << 8)
    a2 = r[4] + (r[5] << 8)
    a3 = r[6] + (r[7] << 8)
    return _compose16_nc(a0, a1, a2, a3)


@jax.jit
def permute_small_lazy(states_u64):
    """permute_small with lazy (non-canonical) intermediates: every mul/add
    keeps values in [0, 2^64) congruent mod p; ONE conditional subtraction
    canonicalizes the final state.  Bit-exact with permute_small (the limb
    decompositions are exact over the full 64-bit range)."""
    c_np, _m, _f, _o = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    lo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32)
    half = pc.FULL_ROUNDS // 2
    nrp = pc.PARTIAL_ROUNDS

    def full_round(carry, cr):
        lo, hi = carry
        lo, hi = _add_nc(lo, hi, cr[0][None, :], cr[1][None, :])
        lo, hi = _sbox_nc(lo, hi)
        return _mds_small_nc(lo, hi), None

    def partial_round(carry, cr):
        lo, hi = carry
        lo, hi = _add_nc(lo, hi, cr[0][None, :], cr[1][None, :])
        s_lo, s_hi = _sbox_nc(lo[:, 0:1], hi[:, 0:1])
        lo = jnp.concatenate([s_lo, lo[:, 1:]], axis=1)
        hi = jnp.concatenate([s_hi, hi[:, 1:]], axis=1)
        return _mds_small_nc(lo, hi), None

    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (clo[:half], chi[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (clo[half:half + nrp], chi[half:half + nrp]))
    st, _ = jax.lax.scan(full_round, st,
                         (clo[half + nrp:], chi[half + nrp:]))
    lo, hi = _cond_sub_p(*st)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _mds_small_lazy_t(lo, hi):
    """Lazy MDS over (12, batch) planes: unrolled per output column so
    every term is a full-lane (batch,) MAC (no (B,12,12) broadcast
    intermediate, no 12->128 lane padding), carries composed once,
    result non-canonical.  Same digit math as _mds_small_nc."""
    m = _mds_small_table()                          # (12, 12) numpy u32
    planes = (lo & MASK16, lo >> 16, hi & MASK16, hi >> 16)
    accs = []
    for p in planes:
        outs = []
        for j in range(12):
            acc = None
            for i in range(12):
                c = int(m[i][j])
                if c == 0:
                    continue
                term = p[i] * np.uint32(c)
                acc = term if acc is None else acc + term
            outs.append(acc if acc is not None else jnp.zeros_like(p[0]))
        accs.append(jnp.stack(outs))
    a0, a1, a2, a3 = accs
    return _compose16_nc(a0, a1, a2, a3)


@jax.jit
def permute_small_lazy_tt(lo, hi):
    """Lane-major lazy permutation: (12, batch) u32 planes in and out.
    Combines the two independent r3-shootout wins that were only ever
    measured separately: lazy (non-canonical) arithmetic AND the
    transposed layout (batch on the 128 VPU lanes; the state dim of 12
    pads only to 16 sublanes instead of 12->128 lanes)."""
    c_np, _m, _f, _o = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    half = pc.FULL_ROUNDS // 2
    nrp = pc.PARTIAL_ROUNDS

    def full_round(carry, cr):
        lo, hi = carry
        lo, hi = _add_nc(lo, hi, cr[0][:, None], cr[1][:, None])
        lo, hi = _sbox_nc(lo, hi)
        return _mds_small_lazy_t(lo, hi), None

    def partial_round(carry, cr):
        lo, hi = carry
        lo, hi = _add_nc(lo, hi, cr[0][:, None], cr[1][:, None])
        s_lo, s_hi = _sbox_nc(lo[0:1], hi[0:1])
        lo = jnp.concatenate([s_lo, lo[1:]], axis=0)
        hi = jnp.concatenate([s_hi, hi[1:]], axis=0)
        return _mds_small_lazy_t(lo, hi), None

    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (clo[:half], chi[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (clo[half:half + nrp], chi[half:half + nrp]))
    st, _ = jax.lax.scan(full_round, st,
                         (clo[half + nrp:], chi[half + nrp:]))
    return _cond_sub_p(*st)


@jax.jit
def permute_small_lazy_t(states_u64):
    """(batch, 12) uint64 wrapper around permute_small_lazy_tt: two
    transposes move 12 x batch x 8 B once against 30 rounds of
    arithmetic."""
    lo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).T
    hi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32).T
    lo, hi = permute_small_lazy_tt(lo, hi)
    return (lo.astype(jnp.uint64) | (hi.astype(jnp.uint64)
                                     << jnp.uint64(32))).T


@jax.jit
def permute_small_lazy_mxu(states_u64):
    """permute_small_lazy with the MDS on the MXU (f32 limb matmul) —
    bit-identical; candidate for the silicon shootout."""
    c_np, _m, _f, _o = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    lo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32)
    half = pc.FULL_ROUNDS // 2
    nrp = pc.PARTIAL_ROUNDS

    def full_round(carry, cr):
        lo, hi = carry
        lo, hi = _add_nc(lo, hi, cr[0][None, :], cr[1][None, :])
        lo, hi = _sbox_nc(lo, hi)
        return _mds_small_mxu_nc(lo, hi), None

    def partial_round(carry, cr):
        lo, hi = carry
        lo, hi = _add_nc(lo, hi, cr[0][None, :], cr[1][None, :])
        s_lo, s_hi = _sbox_nc(lo[:, 0:1], hi[:, 0:1])
        lo = jnp.concatenate([s_lo, lo[:, 1:]], axis=1)
        hi = jnp.concatenate([s_hi, hi[:, 1:]], axis=1)
        return _mds_small_mxu_nc(lo, hi), None

    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (clo[:half], chi[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (clo[half:half + nrp], chi[half:half + nrp]))
    st, _ = jax.lax.scan(full_round, st,
                         (clo[half + nrp:], chi[half + nrp:]))
    lo, hi = _cond_sub_p(*st)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


@jax.jit
def permute_small(states_u64):
    """(batch, 12) uint64 -> (batch, 12): u32-pair S-box + small-entry
    VPU MDS."""
    c_np, _m, _f, _o = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    lo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32)
    half = pc.FULL_ROUNDS // 2
    nrp = pc.PARTIAL_ROUNDS

    def full_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][None, :], cr[1][None, :])
        lo, hi = _sbox(lo, hi)
        return _mds_small(lo, hi), None

    def partial_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][None, :], cr[1][None, :])
        s_lo, s_hi = _sbox(lo[:, 0:1], hi[:, 0:1])
        lo = jnp.concatenate([s_lo, lo[:, 1:]], axis=1)
        hi = jnp.concatenate([s_hi, hi[:, 1:]], axis=1)
        return _mds_small(lo, hi), None

    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (clo[:half], chi[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (clo[half:half + nrp], chi[half:half + nrp]))
    st, _ = jax.lax.scan(full_round, st,
                         (clo[half + nrp:], chi[half + nrp:]))
    lo, hi = st
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


# ---------------------------------------------------------------------------
# Lane-major ("transposed") small-MDS path: state carried as (12, batch)
# planes.  In the (batch, 12) layout the minor axis is 12, so VPU tiles
# (sublane x 128 lanes) run 12/128 full — ~10x of the machine idles.  With
# batch on the minor axis every elementwise op and every MDS
# multiply-accumulate runs full-width.  Arithmetic is identical to
# permute_small (bit-exact); only the data layout differs.
# ---------------------------------------------------------------------------


def _mds_small_t(lo, hi):
    """lo, hi: (12, batch) u32 planes -> MDS output planes (12, batch).

    out_j = sum_i s_i * M[i][j]; per 16-bit plane the products are
    6-bit x 16-bit accumulated over 12 terms (< 2^26, exact in u32),
    then one carry composition + Goldilocks reduction — unrolled so each
    term is a full-lane (batch,) vector op."""
    m = _mds_small_table()                         # (12, 12) numpy u32
    planes = (lo & MASK16, lo >> 16, hi & MASK16, hi >> 16)
    accs = []
    for p in planes:
        outs = []
        for j in range(12):
            acc = None
            for i in range(12):
                c = int(m[i][j])
                if c == 0:
                    continue
                term = p[i] * np.uint32(c)
                acc = term if acc is None else acc + term
            outs.append(acc if acc is not None else jnp.zeros_like(p[0]))
        accs.append(jnp.stack(outs))
    a0, a1, a2, a3 = accs
    n0 = a0 & MASK16
    t1 = (a0 >> 16) + a1
    n1 = t1 & MASK16
    t2 = (t1 >> 16) + a2
    n2 = t2 & MASK16
    t3 = (t2 >> 16) + a3
    n3 = t3 & MASK16
    top = t3 >> 16
    lo = n0 | (n1 << 16)
    hi = n2 | (n3 << 16)
    nz = (top != 0).astype(jnp.uint32)
    return _add(lo, hi, jnp.zeros_like(top) - top, top - nz)


@jax.jit
def permute_small_tt(lo, hi):
    """Transposed-plane permutation: (12, batch) u32 (lo, hi) -> same.
    Bit-exact with permute_small; layout keeps batch on the VPU lanes."""
    c_np, _m, _f, _o = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    half = pc.FULL_ROUNDS // 2
    nrp = pc.PARTIAL_ROUNDS

    def full_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][:, None], cr[1][:, None])
        lo, hi = _sbox(lo, hi)
        return _mds_small_t(lo, hi), None

    def partial_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][:, None], cr[1][:, None])
        s_lo, s_hi = _sbox(lo[0:1], hi[0:1])
        lo = jnp.concatenate([s_lo, lo[1:]], axis=0)
        hi = jnp.concatenate([s_hi, hi[1:]], axis=0)
        return _mds_small_t(lo, hi), None

    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (clo[:half], chi[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (clo[half:half + nrp], chi[half:half + nrp]))
    st, _ = jax.lax.scan(full_round, st,
                         (clo[half + nrp:], chi[half + nrp:]))
    return st


@jax.jit
def permute_small_t(states_u64):
    """(batch, 12) uint64 -> (batch, 12): transpose to lane-major planes,
    permute full-width, transpose back.  The two transposes move
    12 x batch x 8 B — noise against 30 rounds of arithmetic."""
    lo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).T
    hi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32).T
    lo, hi = permute_small_tt(lo, hi)
    return (lo.astype(jnp.uint64) | (hi.astype(jnp.uint64)
                                     << jnp.uint64(32))).T


# ---------------------------------------------------------------------------
# MXU path: the MDS layer as an exact bf16 block-matmul.
#
# The 12x12 MDS multiply is where ~90% of the permutation's integer
# multiplies live; on TPU the systolic array does it for free if the
# arithmetic is exact: split every element into eight 8-bit limbs (bf16
# holds 0..255 exactly), matmul against the limb-blocked MDS matrix with
# f32 accumulation (per-entry sums < 2^23 < 2^24, exact), then carry-
# compose the 15 output limb planes back into u32 pairs with one
# Goldilocks reduction.  S-box rounds stay on the VPU in u32 pairs.
# ---------------------------------------------------------------------------

N_LIMB = 8          # 8-bit limbs per 64-bit element


@functools.lru_cache(maxsize=None)
def _mds_mxu_matrix():
    """(12*N_LIMB, 12*n_out) bf16 block matrix: big[(a*12+i), (k*12+j)] =
    limb_{k-a}(M[i][j]).  n_out adapts to the matrix entry width — the
    official Poseidon-GL MDS is circulant with entries <= 41 (one 8-bit
    limb), so the matrix is block-diagonal with n_out = 8."""
    _c, m_np, _f, _o = _tables()
    m_bytes = (int(m_np.max()).bit_length() + 7) // 8
    n_out = N_LIMB + m_bytes - 1
    big = np.zeros((12 * N_LIMB, 12 * n_out), dtype=np.float32)
    for i in range(12):
        for j in range(12):
            v = int(m_np[i][j])
            for b in range(m_bytes):
                limb = (v >> (8 * b)) & 0xFF
                if limb == 0:
                    continue
                for a in range(N_LIMB):
                    big[a * 12 + i, (a + b) * 12 + j] = limb
    return big, n_out


def _to_limbs_bf16(lo, hi):
    """(batch, 12) u32 pairs -> (batch, N_LIMB*12) bf16 8-bit limbs,
    limb-major blocks [a*12 + i]."""
    planes = []
    for a in range(4):
        planes.append((lo >> (8 * a)) & jnp.uint32(0xFF))
    for a in range(4):
        planes.append((hi >> (8 * a)) & jnp.uint32(0xFF))
    return jnp.concatenate(planes, axis=1).astype(jnp.bfloat16)


def _sub_pair(alo, ahi, blo, bhi):
    """(a - b) mod p on u32 pairs (adds p on borrow)."""
    lo = alo - blo
    bw0 = (alo < blo).astype(jnp.uint32)
    hi0 = ahi - bhi
    bw1 = (ahi < bhi).astype(jnp.uint32)
    hi = hi0 - bw0
    bw2 = (hi0 < bw0).astype(jnp.uint32)
    borrow = bw1 | bw2
    # + p  (p = 2^64 - 2^32 + 1): lo += 1, hi += 0xFFFFFFFF
    lo2 = lo + P_LO
    c = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + P_HI + c
    lo = jnp.where(borrow == 1, lo2, lo)
    hi = jnp.where(borrow == 1, hi2, hi)
    return lo, hi


def _from_out_limbs(out_f32, n_out):
    """(batch, n_out*12) exact f32 limb sums -> reduced u32 pairs."""
    b = out_f32.shape[0]
    c_int = out_f32.astype(jnp.uint32)              # < 2^23, exact
    c = c_int.reshape(b, n_out, 12)
    # 8-bit carry composition over 17 byte columns
    bytes_cols = []
    carry = jnp.zeros((b, 12), dtype=jnp.uint32)
    for mcol in range(17):
        s = carry
        for j in range(3):
            k = mcol - j
            if 0 <= k < n_out:
                s = s + ((c[:, k, :] >> (8 * j)) & jnp.uint32(0xFF))
        bytes_cols.append(s & jnp.uint32(0xFF))
        carry = s >> 8
    # u32 digits n0..n4 (the tail carry is < 2^8 and lands in n4)
    dig = []
    for d in range(4):
        v = bytes_cols[4 * d] \
            | (bytes_cols[4 * d + 1] << 8) \
            | (bytes_cols[4 * d + 2] << 16) \
            | (bytes_cols[4 * d + 3] << 24)
        dig.append(v)
    n4 = bytes_cols[16] | (carry << 8)
    n0, n1, n2, n3 = dig
    # reduce n4*2^128 + n3*2^96 + n2*2^64 + (n1:n0)
    #   2^64 ≡ 2^32 - 1,  2^96 ≡ -1,  2^128 ≡ -2^32
    lo, hi = n0, n1
    # + n2 * (2^32 - 1) = (n2 << 32) - n2
    nz = (n2 != 0).astype(jnp.uint32)
    lo, hi = _add(lo, hi, jnp.zeros_like(n2) - n2, n2 - nz)
    # - n3
    lo, hi = _sub_pair(lo, hi, n3, jnp.zeros_like(n3))
    # - n4 * 2^32
    lo, hi = _sub_pair(lo, hi, jnp.zeros_like(n4), n4)
    return _cond_sub_p(lo, hi)


def _mds_mxu(lo, hi):
    limbs = _to_limbs_bf16(lo, hi)
    big_np, n_out = _mds_mxu_matrix()
    big = jnp.asarray(big_np, dtype=jnp.bfloat16)
    out = jax.lax.dot_general(limbs, big,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return _from_out_limbs(out, n_out)


@jax.jit
def permute_mxu(states_u64):
    """(batch, 12) uint64 -> (batch, 12): S-box on the VPU (u32 pairs),
    MDS on the MXU (exact bf16 limb matmul)."""
    c_np, _m, _f, _o = _tables()
    clo = jnp.asarray((c_np & 0xFFFFFFFF).astype(np.uint32))
    chi = jnp.asarray((c_np >> 32).astype(np.uint32))
    lo = (states_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (states_u64 >> jnp.uint64(32)).astype(jnp.uint32)
    half = pc.FULL_ROUNDS // 2
    nrp = pc.PARTIAL_ROUNDS

    def full_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][None, :], cr[1][None, :])
        lo, hi = _sbox(lo, hi)
        return _mds_mxu(lo, hi), None

    def partial_round(carry, cr):
        lo, hi = carry
        lo, hi = _add(lo, hi, cr[0][None, :], cr[1][None, :])
        s_lo, s_hi = _sbox(lo[:, 0:1], hi[:, 0:1])
        lo = jnp.concatenate([s_lo, lo[:, 1:]], axis=1)
        hi = jnp.concatenate([s_hi, hi[:, 1:]], axis=1)
        return _mds_mxu(lo, hi), None

    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (clo[:half], chi[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (clo[half:half + nrp], chi[half:half + nrp]))
    st, _ = jax.lax.scan(full_round, st,
                         (clo[half + nrp:], chi[half + nrp:]))
    lo, hi = st
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
