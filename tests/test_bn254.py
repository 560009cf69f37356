"""BN254 curve + MSM vs naive oracle."""

import numpy as np

from xlayer_prover_tpu.fields import bn254 as bn


def test_generator_on_curve_and_order():
    assert bn.g1_is_on_curve(bn.G1_GEN)
    g = bn.g1_from_affine(bn.G1_GEN)
    # r * G = infinity
    assert bn.g1_mul(g, bn.R) == bn.INF
    # (r-1) * G = -G
    neg = bn.g1_to_affine(bn.g1_mul(g, bn.R - 1))
    assert neg == (bn.G1_GEN[0], (bn.P - bn.G1_GEN[1]) % bn.P)


def test_add_double_consistency():
    g = bn.g1_from_affine(bn.G1_GEN)
    g2a = bn.g1_to_affine(bn.g1_double(g))
    g2b = bn.g1_to_affine(bn.g1_add(g, g))
    # add(P, P) must route through doubling
    assert g2a == g2b
    g3a = bn.g1_to_affine(bn.g1_add(bn.g1_double(g), g))
    g3b = bn.g1_to_affine(bn.g1_mul(g, 3))
    assert g3a == g3b


def test_msm_vs_naive(rng):
    g = bn.g1_from_affine(bn.G1_GEN)
    n = 20
    scalars = [int(s) for s in rng.integers(0, 1 << 62, size=n)]
    base_scalars = [int(s) for s in rng.integers(1, 1 << 30, size=n)]
    points = [bn.g1_to_affine(bn.g1_mul(g, b)) for b in base_scalars]
    got = bn.g1_to_affine(bn.msm(points, scalars, window_bits=4))
    total = sum(s * b for s, b in zip(scalars, base_scalars)) % bn.R
    exp = bn.g1_to_affine(bn.g1_mul(g, total))
    assert got == exp


def test_msm_with_zero_scalars(rng):
    g = bn.g1_from_affine(bn.G1_GEN)
    points = [bn.G1_GEN, bn.g1_to_affine(bn.g1_mul(g, 5))]
    assert bn.msm(points, [0, 0]) == bn.INF
    got = bn.g1_to_affine(bn.msm(points, [0, 3]))
    assert got == bn.g1_to_affine(bn.g1_mul(g, 15))
