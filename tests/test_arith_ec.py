"""Arith EC circuit (eq1..eq10): trace checks, tamper negatives, oracle.

Covers the reference Arith SM EC kernels (src/sm/arith/sm_arith_eq1..10.cpp
and the selector/carry mechanics of arith_executor.cpp) as a provable AIR:
secp256k1 add/double with the x1!=x2 and alias-free side arguments, and
BN254 complex mul/add/sub.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import arith_ec_sm
from xlayer_prover_tpu.models.zkevm.arith_ec_sm import (BN_P, SECP_P,
                                                        compute_witness)
from xlayer_prover_tpu.stark.air import AirBuilder, Col

from tools.check_trace import check_trace

N_BITS = 12
LB = 16

GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


def ec_double(x1, y1):
    s = (3 * x1 * x1 * pow(2 * y1, -1, SECP_P)) % SECP_P
    x3 = (s * s - 2 * x1) % SECP_P
    y3 = (s * (x1 - x3) - y1) % SECP_P
    return x3, y3


def ec_add(x1, y1, x2, y2):
    s = ((y2 - y1) * pow(x2 - x1, -1, SECP_P)) % SECP_P
    x3 = (s * s - x1 - x2) % SECP_P
    y3 = (s * (x1 - x3) - y1) % SECP_P
    return x3, y3


def _actions():
    d2 = ec_double(GX, GY)
    d3 = ec_add(GX, GY, *d2)
    # BN254 complex: (3+4i)*(5+6i) = -9+38i; adds/subs
    mul_x3 = (3 * 5 - 4 * 6) % BN_P
    mul_y3 = (4 * 5 + 3 * 6) % BN_P
    return [
        (2, GX, GY, GX, GY, d2[0], d2[1]),          # double
        (1, GX, GY, d2[0], d2[1], d3[0], d3[1]),    # add
        (3, 3, 4, 5, 6, mul_x3, mul_y3),            # Fp2 mul
        (4, 3, 4, 5, 6, 8, 10),                     # Fp2 add
        (5, 3, 4, 5, 6, (3 - 5) % BN_P, (4 - 6) % BN_P),   # Fp2 sub
    ]


def _build(n_bits=N_BITS, lb=LB):
    b = AirBuilder("arith_ec", n_bits, n_queries=4, fri_fold_bits=3)
    rng = b.fixed("RANGE16")
    ecl = arith_ec_sm.build(b, lb, rng)
    air = b.compile()
    return air, ecl, rng


@pytest.fixture(scope="module")
def ec_air():
    # lb=16 range table needs 2^16 rows; scale to lb=8 at 2^12
    air, ecl, rng = _build(N_BITS, 8)
    const_np = np.zeros((air.n, air.const_width), dtype=np.uint64)
    const_np[:, rng.index] = np.arange(air.n, dtype=np.uint64) % 256
    arith_ec_sm.fill_fixed(ecl, const_np)
    cm1 = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    arith_ec_sm.expand_into(ecl, _actions(), cm1)
    return air, ecl, const_np, cm1


def test_compute_witness_exactness():
    for act in _actions():
        s, q0, q1, q2 = compute_witness(*act)
        assert q0 >= 0 and q1 >= 0 and q2 >= 0
        if act[0] in (1, 2):
            assert 0 <= s < SECP_P


def test_wrong_result_rejected():
    d2 = ec_double(GX, GY)
    with pytest.raises(AssertionError):
        compute_witness(2, GX, GY, GX, GY, d2[0], (d2[1] + 1) % SECP_P)
    with pytest.raises(AssertionError):
        compute_witness(4, 3, 4, 5, 6, 9, 10)


def test_add_same_point_rejected():
    with pytest.raises(AssertionError):
        compute_witness(1, GX, GY, GX, GY, 0, 0)


def test_trace_checks(ec_air):
    air, ecl, const_np, cm1 = ec_air
    assert check_trace(air, const_np, cm1, []) == []


def test_tampered_x3_fails(ec_air):
    """Corrupting an x3 limb breaks its equation chain or the alias scan."""
    air, ecl, const_np, cm1 = ec_air
    bad = cm1.copy()
    bad[0, ecl.witness["x3"].index] ^= np.uint64(1)
    assert check_trace(air, const_np, bad, []) != []


def test_tampered_slope_fails(ec_air):
    air, ecl, const_np, cm1 = ec_air
    bad = cm1.copy()
    bad[3, ecl.witness["s"].index] ^= np.uint64(1)
    assert check_trace(air, const_np, bad, []) != []


def test_alias_value_fails(ec_air):
    """x3 >= p must fail the lexicographic compare: take the sub block and
    shift x3 by +p (same residue, aliased representation)."""
    air, ecl, const_np, cm1 = ec_air
    rpo = ecl.rows_per_op
    acts = _actions()
    bad_acts = list(acts)
    k = 4  # Fp2 sub block
    kind, x1, y1, x2, y2, x3, y3 = bad_acts[k]
    bad_acts[k] = (kind, x1, y1, x2, y2, x3 + BN_P, y3)
    cm1b = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    # q shifts by one with the aliased x3; the equations still balance,
    # so only the alias scan must reject
    arith_ec_sm.expand_into(ecl, bad_acts, cm1b)
    assert check_trace(air, const_np, cm1b, []) != []
