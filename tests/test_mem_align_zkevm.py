"""MemAlign inside the zkEVM AIR: Main memAlignRD/WR/WR8 rows bound to the
MemAlign SM circuit (operand limbs, offset, op kind) in one AIR.

Mirrors the reference main.pil memAlign lookups against
src/sm/mem_align/mem_align_executor.cpp, end-to-end: ROM execution ->
trace expansion -> constraint checks, plus binding negatives.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.executor.executor import Executor
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.models.zkevm.mem_align_sm import (MemAlignAction,
                                                         apply_action)
from xlayer_prover_tpu.state.hashdb import HashDB

from tools.check_trace import check_trace

N_BITS = 12

M0 = int.from_bytes(bytes(range(32)), "big")
M1 = int.from_bytes(bytes(range(32, 64)), "big")
VAL = int.from_bytes(bytes(range(100, 132)), "big")
OFF = 5

RD_V, _, _ = apply_action(MemAlignAction("RD", M0, M1, OFF, 0))
_, WR_W0, WR_W1 = apply_action(MemAlignAction("WR", M0, M1, OFF, VAL))
_, W8_W0, _ = apply_action(MemAlignAction("WR8", M0, M1, 9, 0xAB))


def mem_align_rom():
    prog = []
    labels = {}

    def line(**kw):
        prog.append(kw)
        return len(prog) - 1

    labels["start"] = line(CONSTL=M0, setA=1)
    line(CONSTL=M1, setB=1)
    line(CONSTL=OFF, setC=1)
    # RD: op = expected read value
    line(CONSTL=RD_V, memAlignRD=1, setD=1)
    # WR: D/E = expected new words, op = value
    line(CONSTL=WR_W0, setD=1)
    line(CONSTL=WR_W1, setE=1)
    line(CONSTL=VAL, memAlignWR=1)
    # WR8 at offset 9
    line(CONSTL=9, setC=1)
    line(CONSTL=W8_W0, setD=1)
    line(CONSTL=0xAB, memAlignWR8=1)
    labels["finalizeExecution"] = len(prog)
    line()
    return Rom.from_json({"program": prog, "labels": labels,
                          "constants": {}})


@pytest.fixture(scope="module")
def ma_exec():
    ex = Executor(mem_align_rom(), n_bits=N_BITS, chunk_bits=2, limb_bits=8,
                  n_queries=4, max_steps=1 << 10)
    res = ex.execute(HashDB())
    return ex, res


def test_actions_recorded(ma_exec):
    ex, res = ma_exec
    ctx = res.ctx
    assert ctx.done
    kinds = [a[0] for a in ctx.required.mem_align]
    assert kinds == ["RD", "WR", "WR8"]
    assert ctx.counters.mem_align == 3


def test_full_air_trace_checks(ma_exec):
    ex, res = ma_exec
    assert ex.layout.mem_align is not None
    assert check_trace(ex.air, res.const_np, res.cm1_np, res.publics) == []


def test_tampered_write_word_fails(ma_exec):
    """Corrupting the MemAlign inW0 byte stream breaks either the write
    byte rule or the Main -> MemAlign binding."""
    ex, res = ma_exec
    bad = res.cm1_np.copy()
    w = ex.layout.mem_align.witness
    # WR occupies block 1 (rows 32..63); flip a written byte
    bad[32 + OFF + 2, w["inW0"].index] ^= np.uint64(1)
    assert check_trace(ex.air, res.const_np, bad, res.publics) != []


def test_tampered_main_offset_fails(ma_exec):
    """Corrupting Main's C0 (the offset operand) breaks the binding."""
    ex, res = ma_exec
    bad = res.cm1_np.copy()
    mw = ex.layout.main.witness
    rows = np.nonzero(res.cm1_np[:, mw["memAlignRD"].index])[0]
    bad[rows[0], mw["C0"].index] ^= np.uint64(1)
    failures = check_trace(ex.air, res.const_np, bad, res.publics)
    assert any("plookup" in f for f in failures)
