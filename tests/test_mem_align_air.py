"""MemAlign SM circuit: trace checks, tamper negatives, zkEVM binding.

Covers the reference MemAlign SM semantics (src/sm/mem_align/
mem_align_executor.cpp) as a provable AIR: RD/WR/WR8 at offsets 0..32,
the rotated-value factor lookup, and the Main SM operand binding.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import mem_align_sm
from xlayer_prover_tpu.models.zkevm.mem_align_sm import (MemAlignAction,
                                                         apply_action)
from xlayer_prover_tpu.stark.air import AirBuilder

from tools.check_trace import check_trace

N_BITS = 12


def _build(n_bits=N_BITS):
    b = AirBuilder("memalign", n_bits, n_queries=4, fri_fold_bits=3)
    mal = mem_align_sm.build(b, n_bits)
    return b.compile(), mal


def _traces(air, mal, actions):
    const_np = np.zeros((air.n, air.const_width), dtype=np.uint64)
    mem_align_sm.fill_fixed(mal, const_np)
    cm1 = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    results = mem_align_sm.expand_into(mal, actions, cm1)
    return const_np, cm1, results


M0 = int.from_bytes(bytes(range(32)), "big")
M1 = int.from_bytes(bytes(range(32, 64)), "big")
VAL = int.from_bytes(bytes(range(100, 132)), "big")


def _actions():
    acts = []
    for off in (0, 5, 31, 32):
        rd = MemAlignAction("RD", M0, M1, off, 0)
        v, _, _ = apply_action(rd)
        acts.append(MemAlignAction("RD", M0, M1, off, v))
        acts.append(MemAlignAction("WR", M0, M1, off, VAL))
    acts.append(MemAlignAction("WR8", M0, M1, 3, 0xAB))
    acts.append(MemAlignAction("WR8", M0, M1, 31, 0x7F))
    return acts


@pytest.fixture(scope="module")
def ma_air():
    air, mal = _build()
    const_np, cm1, results = _traces(air, mal, _actions())
    return air, mal, const_np, cm1, results


def test_trace_checks(ma_air):
    air, mal, const_np, cm1, _ = ma_air
    assert check_trace(air, const_np, cm1, []) == []


def test_limb_reconstruction(ma_air):
    """The committed byte streams reconstruct exactly the oracle values
    through the binding limb expressions (checked numerically)."""
    air, mal, const_np, cm1, results = ma_air
    w = mal.witness
    for k, a in enumerate(_actions()):
        base = k * 32
        vv, w0, w1 = results[k]
        exp_v, exp_w0, exp_w1 = apply_action(a)
        if a.op == "WR8" or a.op == "WR":
            assert (w0, w1) == (exp_w0, exp_w1)
        else:
            assert vv == exp_v
        # m0/m1 from the byte columns
        for col, val in (("inM0", a.m0), ("inM1", a.m1)):
            got = int.from_bytes(
                bytes(int(cm1[base + j, w[col].index]) for j in range(32)),
                "big")
            assert got == val, (k, col)
        # v from the rotation accumulators at the block's last row
        got_v = 0
        for i in range(8):
            got_v |= int(cm1[base + 31, w[f"vAcc{i}"].index]) << (32 * i)
        assert got_v == vv, k
        # w0/w1 from the write byte streams
        for col, val in (("inW0", exp_w0), ("inW1", exp_w1)):
            if a.op == "RD":
                val = 0
            if a.op == "WR8":
                # the SM leaves w1 = m1 (Main only checks w0)
                val = a.m1 if col == "inW1" else exp_w0
            got = int.from_bytes(
                bytes(int(cm1[base + j, w[col].index]) for j in range(32)),
                "big")
            assert got == val, (k, col)


def test_tampered_read_byte_fails(ma_air):
    """Flipping an inV byte of a RD block breaks the byte-selection rule."""
    air, mal, const_np, cm1, _ = ma_air
    bad = cm1.copy()
    bad[3, mal.witness["inV"].index] ^= np.uint64(1)
    assert check_trace(air, const_np, bad, []) != []


def test_tampered_offset_fails(ma_air):
    """Changing a block's offset breaks the factor lookup / marker rules."""
    air, mal, const_np, cm1, _ = ma_air
    bad = cm1.copy()
    bad[32:64, mal.witness["offset"].index] += np.uint64(1)
    assert check_trace(air, const_np, bad, []) != []


def test_tampered_factor_fails(ma_air):
    """Forging a factor column breaks the (STEP, offset, wr8) table."""
    air, mal, const_np, cm1, _ = ma_air
    bad = cm1.copy()
    row = 7
    bad[row, mal.witness["fV0"].index] += np.uint64(255)
    assert check_trace(air, const_np, bad, []) != []


def test_offset32_reads_m1(ma_air):
    """offset = 32: the value is exactly m1 (main_executor.cpp:4518)."""
    v, _, _ = apply_action(MemAlignAction("RD", M0, M1, 32, 0))
    assert v == M1
