"""ROM function registry: EC math, Fp2, tx data, memAlign helpers."""

import numpy as np
import pytest

from xlayer_prover_tpu.executor import rom_functions as rf
from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor, scalar_to_fea
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.state.hashdb import HashDB

# secp256k1 generator
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


def _ctx(**vars_):
    rom = Rom.from_json({"program": [{"CONST": 0}], "labels": {"start": 0},
                         "constants": {}})
    return Context(rom, HashDB(), input_vars=vars_)


def test_secp_double_matches_known():
    ctx = _ctx()
    ctx.regs.A = scalar_to_fea(GX)
    ctx.regs.B = scalar_to_fea(GY)
    x2 = rf.x_dbl_point_ec(ctx)
    y2 = rf.y_dbl_point_ec(ctx)
    # 2G (well-known)
    assert x2 == 0xC6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5
    assert y2 == 0x1AE168FEA63DC339A3C58419466CEAEEF7F632653266D0E1236431A950CFE52A
    # G + 2G == 3G via add
    ctx.regs.C = scalar_to_fea(x2)
    ctx.regs.D = scalar_to_fea(y2)
    x3 = rf.x_add_point_ec(ctx)
    assert x3 == 0xF9308A019258C31049344F85F89D5229B531C845836F99B08601F113BCE036F9


def test_inverse_fields():
    ctx = _ctx()
    ctx.regs.A = scalar_to_fea(12345)
    inv = rf.inverse_fp_ec(ctx)
    assert (12345 * inv) % rf.SECP_P == 1
    inv_n = rf.inverse_fn_ec(ctx)
    assert (12345 * inv_n) % rf.SECP_N == 1
    inv_bn = rf.fp_bn254_inv(ctx)
    from xlayer_prover_tpu.fields.bn254 import P as BNP
    assert (12345 * inv_bn) % BNP == 1


def test_sqrt_parity():
    ctx = _ctx()
    ctx.regs.C = scalar_to_fea((GX * GX * GX + 7) % rf.SECP_P)  # y^2 of G
    ctx.regs.D = scalar_to_fea(GY & 1)
    assert rf.sqrt_fp_ec_parity(ctx) == GY


def test_fp2_mul():
    from xlayer_prover_tpu.fields.bn254 import P as BNP
    ctx = _ctx()
    ctx.regs.A = scalar_to_fea(3)
    ctx.regs.B = scalar_to_fea(4)
    ctx.regs.C = scalar_to_fea(5)
    ctx.regs.D = scalar_to_fea(6)
    # (3+4i)(5+6i) = 15-24 + (18+20)i
    assert rf.arith_bn254_mulfp2_x(ctx) == (15 - 24) % BNP
    assert rf.arith_bn254_mulfp2_y(ctx) == 38
    # inverse roundtrip
    ix = rf.fp2_inv_bn254_x(ctx)
    iy = rf.fp2_inv_bn254_y(ctx)
    # (3+4i)(ix+iy i) must be 1
    assert (3 * ix - 4 * iy) % BNP == 1
    assert (3 * iy + 4 * ix) % BNP == 0


def test_get_txs_and_len():
    ctx = _ctx(batchL2Data="0a0b0c0d")
    assert rf.get_txs_len(ctx) == 4
    fea = rf.get_txs(ctx, 1, 2)
    v = 0
    for i in range(8):
        v |= fea[i] << (32 * i)
    assert v == 0x0B0C


def test_cond_and_registry():
    ctx = _ctx()
    assert rf.cond(ctx, 5)[0] == rf.P - 1
    assert rf.cond(ctx, 0) == [0] * 8
    ex = MainExecutor(ctx.rom)
    rf.register_all(ex)
    assert "xAddPointEc" in ex.functions and len(ex.functions) > 25


def test_mem_align_helpers_match_oracle():
    from xlayer_prover_tpu.models.zkevm.mem_align_sm import (MemAlignAction,
                                                             apply_action)
    ctx = _ctx()
    m0 = int.from_bytes(bytes(range(32)), "big")
    m1 = int.from_bytes(bytes(range(32, 64)), "big")
    val = 0xDEADBEEF << 96
    for off in [0, 7, 31]:
        _, exp_m0, exp_m1 = apply_action(MemAlignAction("WR", m0, m1, off, val))
        assert rf.mem_align_wr_w0(ctx, m0, val, off) == exp_m0
        assert rf.mem_align_wr_w1(ctx, m1, val, off) == exp_m1
    _, exp_m0, _ = apply_action(MemAlignAction("WR8", m0, m1, 3, 0xAB))
    assert rf.mem_align_wr8_w0(ctx, m0, 0xAB, 3) == exp_m0


def test_mpdiv_protocol():
    ctx = _ctx()
    # dividend = 2 chunks, divisor = 1 chunk
    a = (123 << 256) | 456
    ctx.mem[10] = scalar_to_fea(456)
    ctx.mem[11] = scalar_to_fea(123)
    ctx.mem[20] = scalar_to_fea(7)
    rf.mp_div(ctx, 10, 2, 20, 1)
    q_len = rf.receive_len_quotient(ctx)
    q = sum(rf.receive_quotient_chunk(ctx, i) << (256 * i)
            for i in range(q_len))
    r_len = rf.receive_len_remainder(ctx)
    r = sum(rf.receive_remainder_chunk(ctx, i) << (256 * i)
            for i in range(r_len))
    assert q == a // 7 and r == a % 7


def test_mpdiv_short():
    ctx = _ctx()
    a = (99 << 256) | 5
    ctx.mem[0] = scalar_to_fea(5)
    ctx.mem[1] = scalar_to_fea(99)
    rem = rf.mp_div_short(ctx, 0, 2, 10)
    assert rem == a % 10
    assert rf.receive_len_quotient(ctx) == 2  # padded to dividend length
    q = sum(rf.receive_quotient_chunk(ctx, i) << (256 * i) for i in range(2))
    assert q == a // 10


def test_out_of_counters_binary():
    """OOC enforcement: tight binary limit -> OUT_OF_COUNTERS_BINARY."""
    from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.state.hashdb import HashDB
    from xlayer_prover_tpu.utils.zkresult import ZkError, ZkResult
    prog = [
        {"CONSTL": 1, "setA": 1},
        {"CONSTL": 2, "setB": 1},
        {"freeInTag": {}, "inFREE": 1, "bin": 1, "binOpcode": 0, "setC": 1},
        {"freeInTag": {}, "inFREE": 1, "bin": 1, "binOpcode": 0, "setC": 1},
        {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 5},
        {},
    ]
    rom = Rom.from_json({"program": prog,
                         "labels": {"start": 0, "finalizeExecution": 5},
                         "constants": {}})
    ex = MainExecutor(rom, max_steps=100)
    ctx = Context(rom, HashDB())
    ctx.counter_limits["binary"] = 1
    try:
        ex.execute(ctx)
        assert False, "expected OOC"
    except ZkError as e:
        assert e.code == ZkResult.OUT_OF_COUNTERS_BINARY
