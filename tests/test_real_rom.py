"""The real fork_9 zkEVM ROM executes the reference e2e testvector batches.

Full batch flow: RLP decode, ECRecover (EC scalar-mul via arith equations),
keccak/poseidon hashing, storage against the shipped pre-state db, through
finalizeExecution.  State roots differ from the vectors' expected values
only by the Poseidon parameter set (the official constants live in the
absent goldilocks submodule; a drop-in slot exists in
ops/poseidon_constants.py).
"""

import os

import pytest

from xlayer_prover_tpu.executor import rom_functions as rf
from xlayer_prover_tpu.executor.input import BatchInput
from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.state.hashdb import HashDB

ROM_PATH = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_{}.json"

pytestmark = pytest.mark.skipif(not os.path.exists(ROM_PATH),
                                reason="reference ROM absent")


@pytest.fixture(scope="module")
def rom():
    return Rom.load(ROM_PATH)


@pytest.mark.parametrize("k", [0, 2])
def test_batch_executes_to_completion(rom, k):
    ex = MainExecutor(rom, max_steps=4_000_000)
    rf.register_all(ex)
    inp = BatchInput.load(VEC.format(k))
    h = HashDB()
    inp.load_db(h)
    ctx = Context(rom, h, input_vars=inp.input_vars())
    inp.setup_registers(ctx)
    ex.execute(ctx)
    assert ctx.done
    assert ctx.counters.steps > 5000
    assert ctx.counters.arith > 400        # ECRecover ran
    assert ctx.counters.keccak_f > 30
    assert len(ctx.required.storage) > 10  # state reads/writes happened
    assert len(ctx.required.binary) > 500
    # deterministic across runs
    ex2 = MainExecutor(rom, max_steps=4_000_000)
    rf.register_all(ex2)
    h2 = HashDB()
    inp.load_db(h2)
    ctx2 = Context(rom, h2, input_vars=inp.input_vars())
    inp.setup_registers(ctx2)
    ex2.execute(ctx2)
    assert ctx2.regs.SR == ctx.regs.SR
    assert ctx2.counters.steps == ctx.counters.steps
