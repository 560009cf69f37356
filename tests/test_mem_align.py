"""MemAlign SM expander vs byte-level oracle."""

import numpy as np

from xlayer_prover_tpu.models.zkevm.mem_align_sm import (MemAlignAction,
                                                         apply_action,
                                                         expand_trace)


def test_rd_aligned_and_unaligned(rng):
    m0 = int.from_bytes(bytes(range(32)), "big")
    m1 = int.from_bytes(bytes(range(32, 64)), "big")
    # aligned read returns m0
    v, _, _ = apply_action(MemAlignAction("RD", m0, m1, 0, 0))
    assert v == m0
    # offset 1 read: bytes 1..32
    v, _, _ = apply_action(MemAlignAction("RD", m0, m1, 1, 0))
    assert v == int.from_bytes(bytes(range(1, 33)), "big")
    # offset 31
    v, _, _ = apply_action(MemAlignAction("RD", m0, m1, 31, 0))
    assert v == int.from_bytes(bytes(range(31, 63)), "big")


def test_wr_roundtrip(rng):
    m0 = int(rng.integers(0, 1 << 63))
    m1 = int(rng.integers(0, 1 << 63))
    val = int.from_bytes(bytes(rng.integers(0, 256, 32, dtype=np.uint8)), "big")
    for off in [0, 5, 17, 31]:
        _, n0, n1 = apply_action(MemAlignAction("WR", m0, m1, off, val))
        back, _, _ = apply_action(MemAlignAction("RD", n0, n1, off, 0))
        assert back == val, off


def test_wr8(rng):
    m0, m1 = 0, 0
    _, n0, n1 = apply_action(MemAlignAction("WR8", m0, m1, 3, 0xAB))
    assert (n0 >> (8 * 28)) & 0xFF == 0xAB
    assert n1 == 0


def test_expand_rows():
    m0 = int.from_bytes(bytes(range(32)), "big")
    m1 = int.from_bytes(bytes(range(32, 64)), "big")
    traces = expand_trace([MemAlignAction("RD", m0, m1, 4, 0)])
    (_, val, _, _, rows) = traces[0]
    assert len(rows) == 32
    assert all(src == out for (_, src, out) in rows)
    assert rows[0][0] == 4 and rows[-1][0] == 35


def test_interpreter_mem_align_ops():
    """memAlignRD/WR through the Main SM interpreter (main_executor.cpp
    4484-4640 semantics)."""
    from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.state.hashdb import HashDB
    m0 = int.from_bytes(bytes(range(32)), "big")
    m1 = int.from_bytes(bytes(range(32, 64)), "big")
    off = 5
    v_expected = ((m0 << (off * 8)) | (m1 >> (256 - off * 8))) & ((1 << 256) - 1)
    prog = [
        {"CONSTL": m0, "setA": 1},
        {"CONSTL": m1, "setB": 1},
        {"CONSTL": off, "setC": 1},
        {"freeInTag": {}, "inFREE": 1, "memAlignRD": 1, "setD": 1},
        {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 5},
        {},
    ]
    rom = Rom.from_json({"program": prog,
                         "labels": {"start": 0, "finalizeExecution": 5},
                         "constants": {}})
    ex = MainExecutor(rom, max_steps=64)
    ctx = Context(rom, HashDB())
    ex.execute(ctx)
    from xlayer_prover_tpu.executor.main_sm import fea_to_scalar
    assert fea_to_scalar(ctx.regs.D) == v_expected
    assert ctx.counters.mem_align == 1
    assert ctx.required.mem_align[0][0] == "RD"
