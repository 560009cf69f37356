"""Host (numpy) Goldilocks arithmetic — vectorized twin of fields.gl.

The prover's eager CPU path (stark/prover.py `_use_jit_pipelines` False)
evaluates constraint DAGs op-by-op; doing that through JAX eager dispatch
costs ~100us per op.  These numpy twins run the identical algorithms
(split-32 wide multiply + plonky2-style branchless reduction, matching
gl._mul_wide/_reduce128) at memory speed on the host, cutting CPU proof
times by an order of magnitude.  The jitted TPU pipelines keep using
fields.gl; results are bit-identical (cross-checked in tests/test_gl.py).
"""

from __future__ import annotations

import numpy as np

P = (1 << 64) - (1 << 32) + 1
P_U64 = np.uint64(P)
EPSILON = np.uint64((1 << 32) - 1)      # 2^64 mod p
MASK32 = np.uint64(0xFFFFFFFF)
U32 = np.uint64(32)


def asarr(x):
    return np.asarray(x, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Native batched backend (libzkcrypto gl_arr_*): one ctypes crossing per
# whole-array op instead of ~10 numpy dispatches + temporaries.  Profiled
# at 2^14: glh primitives were ~160 s of a 367 s host proof, dominated by
# interpreter overhead.  Same branchless algorithms in C -> bit-identical.
# ---------------------------------------------------------------------------

_NATIVE = None          # None = not probed, False = unavailable
_NATIVE_MIN = 1024      # below this, numpy overhead is negligible anyway
_U64P = None


def _nat():
    global _NATIVE, _U64P
    if _NATIVE is None:
        try:
            from ..native import gl_native
            _NATIVE = gl_native() or False
        except Exception:  # noqa: BLE001 — any load failure -> numpy path
            _NATIVE = False
        if _NATIVE is not False:
            import ctypes
            _U64P = ctypes.POINTER(ctypes.c_uint64)
    return _NATIVE or None


def _nat_ready(*arrs):
    """All operands same-shape C-contiguous uint64 ndarrays, big enough."""
    a0 = arrs[0]
    if not isinstance(a0, np.ndarray) or a0.dtype != np.uint64 \
            or a0.size < _NATIVE_MIN or not a0.flags["C_CONTIGUOUS"]:
        return False
    for a in arrs[1:]:
        if not isinstance(a, np.ndarray) or a.dtype != np.uint64 \
                or a.shape != a0.shape or not a.flags["C_CONTIGUOUS"]:
            return False
    return True


def _p(a):
    return a.ctypes.data_as(_U64P)


def _cond_sub_p(x):
    return np.where(x >= P_U64, x - P_U64, x)


def add(a, b):
    a = asarr(a)
    b = asarr(b)
    lib = _nat()
    if lib is not None and _nat_ready(a, b):
        out = np.empty_like(a)
        lib.gl_arr_add(_p(a), _p(b), _p(out), a.size)
        return out
    if lib is not None and _nat_ready(a) and b.ndim == 0:
        out = np.empty_like(a)
        lib.gl_arr_add_scalar(_p(a), int(b), _p(out), a.size)
        return out
    with np.errstate(over="ignore"):
        s = a + b
        s = np.where(s < a, s + EPSILON, s)
        return _cond_sub_p(s)


def sub(a, b):
    a = asarr(a)
    b = asarr(b)
    lib = _nat()
    if lib is not None and _nat_ready(a, b):
        out = np.empty_like(a)
        lib.gl_arr_sub(_p(a), _p(b), _p(out), a.size)
        return out
    with np.errstate(over="ignore"):
        d = a - b
        d = np.where(a < b, d - EPSILON, d)
        return _cond_sub_p(d)


def neg(a):
    a = asarr(a)
    return np.where(a == 0, a, P_U64 - a)


def _mul_wide(a, b):
    a_lo = a & MASK32
    a_hi = a >> U32
    b_lo = b & MASK32
    b_hi = b >> U32
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    lo = a * b
    t = hl + (ll >> U32)
    u = lh + (t & MASK32)
    hi = hh + (t >> U32) + (u >> U32)
    return lo, hi


def _reduce128(lo, hi):
    hi_hi = hi >> U32
    hi_lo = hi & MASK32
    t0 = lo - hi_hi
    t0 = np.where(lo < hi_hi, t0 - EPSILON, t0)
    t1 = hi_lo * EPSILON
    r = t0 + t1
    r = np.where(r < t0, r + EPSILON, r)
    return _cond_sub_p(r)


def mul(a, b):
    a = asarr(a)
    b = asarr(b)
    lib = _nat()
    if lib is not None:
        if _nat_ready(a, b):
            out = np.empty_like(a)
            lib.gl_arr_mul(_p(a), _p(b), _p(out), a.size)
            return out
        if _nat_ready(a) and b.ndim == 0:
            out = np.empty_like(a)
            lib.gl_arr_mul_scalar(_p(a), int(b), _p(out), a.size)
            return out
        if _nat_ready(b) and a.ndim == 0:
            out = np.empty_like(b)
            lib.gl_arr_mul_scalar(_p(b), int(a), _p(out), b.size)
            return out
    with np.errstate(over="ignore"):
        return _reduce128(*_mul_wide(a, b))


def mul_const(a, c: int):
    return mul(a, np.uint64(int(c) % P))


def inv(a):
    """Elementwise inverse via x^(p-2) square-and-multiply (p-2 bits).

    Native path: Montgomery batch inversion — 3 muls/element + one scalar
    exponentiation (zeros map to zero, same as 0^(p-2))."""
    a = asarr(a)
    lib = _nat()
    if lib is not None and _nat_ready(a):
        out = np.empty_like(a)
        scratch = np.empty_like(a)
        lib.gl_arr_inv(_p(a), _p(out), _p(scratch), a.size)
        return out
    e = P - 2
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def sum_axis(a, axis=0):
    """Reduction mod p along an axis (pairwise halving keeps it exact)."""
    a = asarr(a)
    n = a.shape[axis]
    while n > 1:
        half = n // 2
        lo = np.take(a, range(half), axis=axis)
        hi = np.take(a, range(half, 2 * half), axis=axis)
        s = add(lo, hi)
        if n % 2:
            tail = np.take(a, [n - 1], axis=axis)
            s = np.concatenate([s, tail], axis=axis)
            n = half + 1
        else:
            n = half
        a = s
    return np.take(a, 0, axis=axis)


# ---------------------------------------------------------------------------
# Cubic extension F_p[x]/(x^3 - x - 1): triples of uint64 arrays
# ---------------------------------------------------------------------------

def zeros3(shape):
    return tuple(np.zeros(shape, dtype=np.uint64) for _ in range(3))


def from_base3(a):
    a = asarr(a)
    z = np.zeros_like(a)
    return (a, z.copy(), z.copy())


def add3(a, b):
    return tuple(add(a[k], b[k]) for k in range(3))


def sub3(a, b):
    return tuple(sub(a[k], b[k]) for k in range(3))


def add3_base(a, b):
    return (add(a[0], b), a[1], a[2])


def sub3_base(a, b):
    return (sub(a[0], b), a[1], a[2])


def base_sub3(b, a):
    return (sub(b, a[0]), neg(a[1]), neg(a[2]))


def mul3(a, b):
    lib = _nat()
    if lib is not None and _nat_ready(*a, *b):
        o = tuple(np.empty_like(a[0]) for _ in range(3))
        lib.gl_arr_mul3(_p(a[0]), _p(a[1]), _p(a[2]),
                        _p(b[0]), _p(b[1]), _p(b[2]),
                        _p(o[0]), _p(o[1]), _p(o[2]), a[0].size)
        return o
    d0 = mul(a[0], b[0])
    d1 = add(mul(a[0], b[1]), mul(a[1], b[0]))
    d2 = add(add(mul(a[0], b[2]), mul(a[1], b[1])), mul(a[2], b[0]))
    d3 = add(mul(a[1], b[2]), mul(a[2], b[1]))
    d4 = mul(a[2], b[2])
    # x^3 = x + 1 ; x^4 = x^2 + x
    return (add(d0, d3), add(d1, add(d3, d4)), add(d2, d4))


def mul3_base(a, b):
    return tuple(mul(a[k], b) for k in range(3))


# Frobenius matrices for inversion (a -> a^p, a -> a^(p^2)) — reuse the
# exact host computation from gl3
def _frob_mats():
    from . import gl3
    return gl3._frobenius_matrices()


def inv3(a):
    """Batch inverse via the norm method: one base-field inverse chain."""
    f1, f2 = _frob_mats()

    def apply(mat, v):
        out = []
        for k in range(3):
            acc = None
            for i in range(3):
                t = mul_const(v[i], mat[i][k])
                acc = t if acc is None else add(acc, t)
            out.append(acc)
        return tuple(out)

    ap = apply(f1, a)
    ap2 = apply(f2, a)
    t = mul3(ap, ap2)
    norm = mul3(a, t)[0]        # a * a^p * a^(p^2) lies in F_p
    ninv = inv(norm)
    return mul3_base(t, ninv)
