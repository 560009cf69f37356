"""BN254 tower + optimal-ate pairing: algebraic identities."""

import pytest

from xlayer_prover_tpu.fields import bn254
from xlayer_prover_tpu.fields.bn254_tower import (
    B2, FQ12_ONE, G2_GEN, fq2_mul, fq2_inv, fq12_inv, fq12_mul, fq12_pow,
    g2_add, g2_double, g2_is_on_curve, g2_mul, g2_neg, pairing,
    pairing_check)

R = bn254.R
G1 = bn254.G1_GEN


def g1_mul_aff(k):
    return bn254.g1_to_affine(bn254.g1_mul(bn254.g1_from_affine(G1), k))


def test_fq2_field():
    a = (1234567, 7654321)
    ai = fq2_inv(a)
    assert fq2_mul(a, ai) == (1, 0)


def test_fq12_field():
    a = tuple(range(3, 15))
    ai = fq12_inv(a)
    assert fq12_mul(a, ai) == FQ12_ONE


def test_g2_curve_ops():
    assert g2_is_on_curve(G2_GEN)
    d = g2_double(G2_GEN)
    assert g2_is_on_curve(d)
    s = g2_add(G2_GEN, d)
    assert g2_is_on_curve(s)
    assert g2_mul(G2_GEN, 3) == s
    # group order
    assert g2_mul(G2_GEN, R) is None or g2_mul(G2_GEN, R - 1) == \
        g2_neg(G2_GEN)


@pytest.fixture(scope="module")
def e_g1_g2():
    return pairing(G2_GEN, G1)


def test_pairing_nondegenerate(e_g1_g2):
    assert e_g1_g2 != FQ12_ONE


def test_pairing_order(e_g1_g2):
    assert fq12_pow(e_g1_g2, R) == FQ12_ONE


def test_pairing_bilinear(e_g1_g2):
    a, b = 31, 47
    lhs = pairing(g2_mul(G2_GEN, b), g1_mul_aff(a))
    rhs = fq12_pow(e_g1_g2, a * b)
    assert lhs == rhs


def test_pairing_check_cancels(e_g1_g2):
    # e(aG1, G2) * e(-aG1, G2) == 1
    a = 12345
    p = g1_mul_aff(a)
    np_ = bn254.g1_to_affine(bn254.g1_neg(bn254.g1_from_affine(p)))
    assert pairing_check([(p, G2_GEN), (np_, G2_GEN)])
