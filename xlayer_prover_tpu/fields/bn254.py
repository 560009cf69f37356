"""BN254 (alt_bn128) field + G1 curve + Pippenger MSM.

Equivalent of the reference's ffiasm-generated BN254 library
(src/ffiasm/fr.asm/fq.asm, AltBn128 engine, multiexp Pippenger —
src/ffiasm/multiexp.hpp) used by the rapidsnark Groth16 stage.  Round-1
scope is host-exact python (correctness + API); the device-sharded bucket
MSM (SURVEY §7.9: bucket sums as segment reductions over shards) is the
scale-up path.

Curve: y^2 = x^3 + 3 over F_p; r is the scalar field order (= the circuit
field of the final verifier circuits).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

# base field modulus (Fq)
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
# scalar field modulus (Fr)
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

G1_GEN = (1, 2)


def fq_inv(a: int) -> int:
    return pow(a, P - 2, P)


def fr_inv(a: int) -> int:
    return pow(a, R - 2, R)


# ---------------------------------------------------------------------------
# G1 in Jacobian coordinates (Z=0 => infinity)
# ---------------------------------------------------------------------------

INF = (0, 1, 0)


def g1_from_affine(pt: Optional[Tuple[int, int]]):
    if pt is None:
        return INF
    return (pt[0] % P, pt[1] % P, 1)


def g1_to_affine(j):
    x, y, z = j
    if z == 0:
        return None
    zi = fq_inv(z)
    zi2 = zi * zi % P
    return (x * zi2 % P, y * zi2 % P * zi % P)


def g1_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - 3) % P == 0


def g1_double(pt):
    x, y, z = pt
    if z == 0 or y == 0:
        return INF if z == 0 else _dbl(x, y, z)
    return _dbl(x, y, z)


def _dbl(x, y, z):
    a = x * x % P
    b = y * y % P
    c = b * b % P
    d = 2 * ((x + b) * (x + b) - a - c) % P
    e = 3 * a % P
    f = e * e % P
    x3 = (f - 2 * d) % P
    y3 = (e * (d - x3) - 8 * c) % P
    z3 = 2 * y * z % P
    return (x3, y3, z3)


def g1_add(p1, p2):
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    if z1 == 0:
        return p2
    if z2 == 0:
        return p1
    z1z1 = z1 * z1 % P
    z2z2 = z2 * z2 % P
    u1 = x1 * z2z2 % P
    u2 = x2 * z1z1 % P
    s1 = y1 * z2 * z2z2 % P
    s2 = y2 * z1 * z1z1 % P
    if u1 == u2:
        if s1 != s2:
            return INF
        return _dbl(x1, y1, z1)
    h = (u2 - u1) % P
    i = (2 * h) * (2 * h) % P
    j = h * i % P
    r = 2 * (s2 - s1) % P
    v = u1 * i % P
    x3 = (r * r - j - 2 * v) % P
    y3 = (r * (v - x3) - 2 * s1 * j) % P
    z3 = ((z1 + z2) * (z1 + z2) - z1z1 - z2z2) % P * h % P
    return (x3, y3, z3)


def g1_neg(pt):
    x, y, z = pt
    return (x, (P - y) % P, z)


def g1_mul(pt, k: int):
    k %= R
    acc = INF
    base = pt
    while k:
        if k & 1:
            acc = g1_add(acc, base)
        base = g1_double(base)
        k >>= 1
    return acc


# ---------------------------------------------------------------------------
# Pippenger multi-scalar multiplication
# ---------------------------------------------------------------------------

def msm(points_affine: List[Tuple[int, int]], scalars: List[int],
        window_bits: Optional[int] = None):
    """sum_i scalars[i] * points[i] (jacobian result).

    Bucket method: per window of c bits, scatter points into 2^c - 1
    buckets, then the running-sum trick; windows combined by c doublings.
    This is the exact structure the device version parallelizes (buckets as
    segment sums over sharded points).
    """
    n = len(points_affine)
    assert n == len(scalars)
    if n == 0:
        return INF
    c = window_bits or max(2, min(16, (n.bit_length() or 1)))
    nbits = R.bit_length()
    n_windows = (nbits + c - 1) // c
    pts = [g1_from_affine(p) for p in points_affine]
    sc = [s % R for s in scalars]

    acc = INF
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = g1_double(acc)
        buckets = [INF] * ((1 << c) - 1)
        shift = w * c
        for i in range(n):
            digit = (sc[i] >> shift) & ((1 << c) - 1)
            if digit:
                buckets[digit - 1] = g1_add(buckets[digit - 1], pts[i])
        running = INF
        window_sum = INF
        for b in range((1 << c) - 2, -1, -1):
            running = g1_add(running, buckets[b])
            window_sum = g1_add(window_sum, running)
        acc = g1_add(acc, window_sum)
    return acc
