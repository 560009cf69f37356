"""ROM loader + Main SM interpreter tests.

The real fork_9 rom.json (13k lines) must parse completely; the machine is
exercised with synthetic zkASM-style programs (the full zkEVM ROM needs the
eval_command function registry, grown in later rounds).
"""

import os

import pytest

from xlayer_prover_tpu.executor.main_sm import (Context, MainExecutor,
                                                fea_to_scalar)
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.state.hashdb import HashDB

ROM_PATH = "/root/reference/src/main_sm/fork_9/scripts/rom.json"


@pytest.mark.skipif(not os.path.exists(ROM_PATH), reason="reference ROM absent")
def test_load_real_fork9_rom():
    rom = Rom.load(ROM_PATH)
    assert len(rom) == 13268
    assert rom.label("start") == 0
    assert "computeKeccaks" in rom.labels
    for line in rom.program:
        if line.jmp_addr is not None:
            assert 0 <= line.jmp_addr < len(rom)
        if line.else_addr is not None:
            assert 0 <= line.else_addr < len(rom)
    l0 = rom.program[0]
    assert l0.ins.get("inSTEP") == 1 and "setA" in l0.sets


def _mini_rom(program, labels=None):
    return Rom.from_json({"program": program, "labels": labels or {"start": 0},
                          "constants": {}})


def _run(prog, labels, functions=None, max_steps=200):
    rom = _mini_rom(prog, labels)
    ex = MainExecutor(rom, max_steps=max_steps)
    if functions:
        ex.functions.update(functions)
    ctx = Context(rom, HashDB())
    ex.execute(ctx)
    return ctx


def test_mini_program_arith_and_jump():
    # A = 5; B = 7; C = A+B; count RCX 3..0 via JMPZ loop; halt
    prog = [
        {"CONST": 5, "setA": 1},
        {"CONST": 7, "setB": 1},
        {"inA": "1", "inB": "1", "setC": 1},
        {"CONST": 3, "setRCX": 1},
        {"inRCX": "1", "JMPZ": 1, "useJmpAddr": 1, "jmpAddr": 7},
        {"CONST": -1, "inRCX": "1", "setRCX": 1},
        {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 4},
        {"CONST": 0},
    ]
    ctx = _run(prog, {"start": 0, "finalizeExecution": 7})
    assert fea_to_scalar(ctx.regs.A) == 5
    assert fea_to_scalar(ctx.regs.B) == 7
    assert fea_to_scalar(ctx.regs.C) == 12
    assert ctx.regs.RCX == 0


def test_mini_program_memory():
    prog = [
        {"CONST": 1234, "setA": 1},
        {"inA": "1", "mOp": 1, "mWR": 1, "offset": 5},
        {"CONST": 0, "setA": 1},
        {"freeInTag": {}, "inFREE": "1", "mOp": 1, "offset": 5, "setB": 1},
        {"CONST": 0},
    ]
    ctx = _run(prog, {"start": 0, "finalizeExecution": 4})
    assert fea_to_scalar(ctx.regs.B) == 1234
    assert fea_to_scalar(ctx.mem[5]) == 1234


def test_mini_program_assert_fails():
    from xlayer_prover_tpu.utils.zkresult import ZkError
    prog = [
        {"CONST": 9, "setA": 1},
        {"CONST": 8, "assert": 1},
        {"CONST": 0},
    ]
    with pytest.raises(ZkError):
        _run(prog, {"start": 0, "finalizeExecution": 2}, max_steps=10)


def test_mini_program_binary_op():
    # A=10, B=3: SUB via bin opcode 1; op must equal A-B and set no carry
    prog = [
        {"CONST": 10, "setA": 1},
        {"CONST": 3, "setB": 1},
        {"CONST": 7, "bin": 1, "binOpcode": 1, "setC": 1},
        {"CONST": 0},
    ]
    ctx = _run(prog, {"start": 0, "finalizeExecution": 3})
    assert fea_to_scalar(ctx.regs.C) == 7
    assert ctx.carry == 0
    assert len(ctx.required.binary) == 1


def test_mini_program_arith_mul():
    # D:op = A*B + C  with A=12, B=11, C=6 -> 138, D=0
    prog = [
        {"CONST": 12, "setA": 1},
        {"CONST": 11, "setB": 1},
        {"CONST": 6, "setC": 1},
        {"CONST": 0, "setD": 1},
        {"CONST": 138, "arith": 1, "arithEq0": 1},
        {"CONST": 0},
    ]
    ctx = _run(prog, {"start": 0, "finalizeExecution": 5})
    assert ctx.counters.arith == 1


def test_mini_program_free_function_and_storage():
    prog = [
        {"freeInTag": {"op": "functionCall", "funcName": "answer",
                       "params": []}, "inFREE": "1", "setD": 1},
        {"CONST": 3, "setC": 1},
        {"sWR": 1},
        {"freeInTag": {"op": "functionCall", "funcName": "readSlot",
                       "params": []}, "inFREE": "1", "sRD": 1, "setB": 1},
        {"CONST": 0},
    ]

    from xlayer_prover_tpu.executor.main_sm import MainExecutor as ME

    def read_slot(c):
        return c.hashdb.get(c.batch_uuid, ME._root_quad(c.regs.SR),
                            ME._storage_key(c.regs)).value

    ctx = _run(prog, {"start": 0, "finalizeExecution": 4},
               functions={"answer": lambda c: 424242, "readSlot": read_slot})
    assert fea_to_scalar(ctx.regs.D) == 424242
    assert fea_to_scalar(ctx.regs.B) == 424242
    assert ctx.regs.SR != [0] * 8
    assert len(ctx.required.storage) == 2


def test_mini_program_jmpn():
    prog = [
        {"CONST": -5, "JMPN": 1, "useJmpAddr": 1, "jmpAddr": 2},
        {"CONST": 111, "setA": 1},   # skipped
        {"CONST": 222, "setB": 1},
        {"CONST": 0},
    ]
    ctx = _run(prog, {"start": 0, "finalizeExecution": 3}, max_steps=10)
    assert fea_to_scalar(ctx.regs.A) == 0
    assert fea_to_scalar(ctx.regs.B) == 222


def test_mini_program_call_return():
    prog = [
        {"CONST": 1, "setA": 1},
        {"call": 1, "useJmpAddr": 1, "jmpAddr": 4},
        {"CONST": 3, "setC": 1},
        {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 6},
        {"CONST": 2, "setB": 1},        # subroutine
        {"return": 1},
        {"CONST": 0},
    ]
    ctx = _run(prog, {"start": 0, "finalizeExecution": 6}, max_steps=20)
    assert fea_to_scalar(ctx.regs.A) == 1
    assert fea_to_scalar(ctx.regs.B) == 2
    assert fea_to_scalar(ctx.regs.C) == 3


def test_mini_program_hashk():
    # absorb two bytes 0xAB 0xCD, then check the keccak digest
    from xlayer_prover_tpu.ops.keccak import keccak256
    digest = int.from_bytes(keccak256(bytes([0xAB, 0xCD])), "big")
    prog = [
        {"CONST": 1, "setD": 1},
        {"CONST": 0xAB, "hashK": 1, "offset": 0},
        {"CONST": 0xCD, "hashK": 1, "offset": 0},
        {"CONSTL": str(digest), "hashKDigest": 1, "offset": 0, "setA": 1},
        {"CONST": 0},
    ]
    ctx = _run(prog, {"start": 0, "finalizeExecution": 4}, max_steps=10)
    assert fea_to_scalar(ctx.regs.A) == digest
    assert ctx.regs.HASHPOS == 2


def test_native_executor_parity():
    """Native fast-execution core matches the Python interpreter on the
    real fork_9 testvector (registers + counters)."""
    import os
    import pytest as _pytest
    from xlayer_prover_tpu.executor import nexec
    if not nexec.available():
        _pytest.skip("libnexec.so not built")
    rom_path = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
    vec = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"
    if not (os.path.exists(rom_path) and os.path.exists(vec)):
        _pytest.skip("reference testvectors absent")
    from xlayer_prover_tpu.executor import rom_functions as rf
    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.main_sm import Context
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.state.hashdb import HashDB
    rom = Rom.load(rom_path)
    inp = BatchInput.load(vec)
    results = []
    for make in (lambda: _py(rom), lambda: _nat(rom)):
        ex = make()
        hdb = HashDB()
        inp.load_db(hdb)
        ctx = Context(rom, hdb, input_vars=inp.input_vars())
        inp.setup_registers(ctx)
        ex.execute(ctx)
        results.append(ctx)
    c1, c2 = results
    for r in ("A", "B", "C", "D", "E", "SR", "CTX", "SP", "PC", "GAS",
              "RR", "HASHPOS", "RCX"):
        assert getattr(c1.regs, r) == getattr(c2.regs, r), r
    assert c1.counters == c2.counters


def _py(rom):
    from xlayer_prover_tpu.executor import rom_functions as rf
    from xlayer_prover_tpu.executor.main_sm import MainExecutor
    ex = MainExecutor(rom, max_steps=1 << 22)
    rf.register_all(ex)
    return ex


def _nat(rom):
    from xlayer_prover_tpu.executor import rom_functions as rf
    from xlayer_prover_tpu.executor.nexec import NativeMainExecutor
    ex = NativeMainExecutor(rom, max_steps=1 << 22)
    rf.register_all(ex.py)
    return ex
