"""The real fork_9 zkEVM ROM executes the reference e2e testvector batches
BIT-EXACTLY: the final SR register equals the vector's newStateRoot, and D/E
hold newAccInputHash/newLocalExitRoot, exactly as the reference asserts at
the finalizeExecution step (main_executor.cpp:5822-5930 assertOutputs).

Full batch flow per vector: RLP decode, ECRecover (EC scalar-mul via arith
equations), keccak/poseidon hashing, storage against the shipped pre-state
db, block-info-tree receipts, consolidation, through finalizeExecution.
"""

import json
import os

import pytest

from xlayer_prover_tpu.executor import rom_functions as rf
from xlayer_prover_tpu.executor.input import BatchInput
from xlayer_prover_tpu.executor.main_sm import (Context, MainExecutor,
                                                fea_to_scalar)
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.state.hashdb import HashDB

ROM_PATH = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_{}.json"

pytestmark = pytest.mark.skipif(not os.path.exists(ROM_PATH),
                                reason="reference ROM absent")


@pytest.fixture(scope="module")
def rom():
    return Rom.load(ROM_PATH)


def _run(rom, k):
    ex = MainExecutor(rom, max_steps=4_000_000)
    rf.register_all(ex)
    inp = BatchInput.load(VEC.format(k))
    h = HashDB()
    inp.load_db(h)
    ctx = Context(rom, h, input_vars=inp.input_vars())
    inp.setup_registers(ctx)
    ex.execute(ctx)
    return ctx


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_state_root_parity(rom, k):
    """assertOutputs parity: SR == newStateRoot, D == newAccInputHash,
    E == newLocalExitRoot, PC == newNumBatch for every e2e vector."""
    with open(VEC.format(k)) as f:
        raw = json.load(f)
    ctx = _run(rom, k)
    assert ctx.done
    assert fea_to_scalar(ctx.regs.SR) == int(raw["newStateRoot"], 16)
    assert fea_to_scalar(ctx.regs.D) == int(raw["newAccInputHash"], 16)
    assert fea_to_scalar(ctx.regs.E) == int(raw["newLocalExitRoot"], 16)
    assert ctx.regs.PC == raw["newNumBatch"]


def test_batch_executes_to_completion(rom):
    ctx = _run(rom, 0)
    assert ctx.done
    assert ctx.counters.steps > 5000
    assert ctx.counters.arith > 400        # ECRecover ran
    # cntKeccakF counts padded permutation blocks at the Digest row
    # (main_executor.cpp:2906), not byte writes
    assert ctx.counters.keccak_f >= 5
    assert ctx.counters.poseidon_g > 100   # proofHashCounter-weighted
    assert len(ctx.required.storage) > 10  # state reads/writes happened
    assert len(ctx.required.binary) > 500
    # deterministic across runs
    ctx2 = _run(rom, 0)
    assert ctx2.regs.SR == ctx.regs.SR
    assert ctx2.counters.steps == ctx.counters.steps
