"""Batch-capacity semantics: out-of-counters + the 120 kB calldata wall.

Reference contracts: MAX_BATCH_L2_DATA_SIZE = 120,000 bytes
(src/prover/input.hpp:16-19, derived from the Keccak SM capacity) and the
per-SM counter limits whose overflow surfaces as the specific
EXECUTOR_ERROR_SM_MAIN_COUNTERS_OVERFLOW_* wire codes
(main_executor.hpp:66-73, executor_service.cpp zkresult mapping).
"""

import os

import pytest

from xlayer_prover_tpu.executor import rom_functions as rf
from xlayer_prover_tpu.executor.executor import Executor
from xlayer_prover_tpu.executor.input import BatchInput
from xlayer_prover_tpu.executor.main_sm import Context
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.state.hashdb import HashDB
from xlayer_prover_tpu.utils.zkresult import ZkError, ZkResult

REF_ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"

needs_ref = pytest.mark.skipif(not os.path.exists(REF_ROM),
                               reason="reference ROM absent")


@pytest.fixture(scope="module")
def engine():
    rom = Rom.load(REF_ROM)
    ex = Executor(rom, n_bits=16, max_steps=1 << 15)
    rf.register_all(ex.main)
    return ex


@needs_ref
def test_counter_limits_come_from_rom_constants(engine):
    """The capacity contract ships inside rom.json (constants.zkasm)."""
    from xlayer_prover_tpu.executor.main_sm import counter_limits_from_rom
    limits = counter_limits_from_rom(engine.rom)
    assert limits["steps"] >= 1 << 22
    assert 0 < limits["keccak_f"] < limits["steps"]
    assert 0 < limits["arith"] < limits["steps"]


@needs_ref
def test_out_of_counters_binary_raises_specific_code(engine):
    """A batch that exceeds a per-SM counter limit fails with the OOC
    zkresult for THAT counter (reference CHECK_MAX_CNT_ASAP)."""
    inp = BatchInput.load(VEC)
    hashdb = HashDB()
    inp.load_db(hashdb)
    ctx = Context(engine.rom, hashdb, "ooc-bin", inp.input_vars())
    inp.setup_registers(ctx)
    ctx.max_steps = 1 << 15
    ctx.counter_limits = dict(ctx.counter_limits)
    ctx.counter_limits["binary"] = 8       # vector 0 uses ~670 binary ops
    with pytest.raises(ZkError) as ei:
        engine.main.execute(ctx, engine.start_label, engine.stop_label)
    assert ei.value.code == ZkResult.OUT_OF_COUNTERS_BINARY


@needs_ref
def test_out_of_counters_steps(engine):
    inp = BatchInput.load(VEC)
    hashdb = HashDB()
    inp.load_db(hashdb)
    ctx = Context(engine.rom, hashdb, "ooc-steps", inp.input_vars())
    inp.setup_registers(ctx)
    ctx.max_steps = 1 << 15
    ctx.counter_limits = dict(ctx.counter_limits)
    ctx.counter_limits["steps"] = 100
    with pytest.raises(ZkError) as ei:
        engine.main.execute(ctx, engine.start_label, engine.stop_label)
    assert ei.value.code == ZkResult.OUT_OF_COUNTERS_STEP


@needs_ref
def test_ooc_maps_to_specific_wire_error():
    """Over the wire, OOC becomes EXECUTOR_ERROR_SM_MAIN_COUNTERS_
    OVERFLOW_* (not UNSPECIFIED) so the sequencer can split the batch."""
    from xlayer_prover_tpu.services.executor_service import \
        _executor_error_of
    from xlayer_prover_tpu.services.gen import executor_pb2 as pb
    e = ZkError(ZkResult.OUT_OF_COUNTERS_KECCAK, "ooc")
    assert _executor_error_of(e) == \
        pb.EXECUTOR_ERROR_SM_MAIN_COUNTERS_OVERFLOW_KECCAK
    e = ZkError(ZkResult.PROVER_ERROR, "other")
    assert _executor_error_of(e) == pb.EXECUTOR_ERROR_UNSPECIFIED


def test_calldata_wall_120k():
    """batch_l2_data over 120,000 bytes is rejected before execution
    (input.hpp:16-19); exactly 120,000 passes the size gate."""
    from xlayer_prover_tpu.services.executor_service import \
        ExecutorServiceImpl
    from xlayer_prover_tpu.services.gen import executor_pb2 as pb
    from xlayer_prover_tpu.executor.rom import Rom as _Rom

    prog = [{"CONST": 1, "setA": 1}, {"CONST": 0}]
    rom = _Rom.from_json({"program": prog,
                          "labels": {"start": 0, "finalizeExecution": 1},
                          "constants": {}})
    impl = ExecutorServiceImpl(Executor(rom, n_bits=11, max_steps=100),
                               HashDB())
    req = pb.ProcessBatchRequestV2(
        old_state_root=b"\x00" * 32,
        batch_l2_data=b"\x00" * (impl.MAX_BATCH_L2_DATA_SIZE + 1))
    resp = impl.process_batch_v2(req, None)
    assert resp.error == pb.EXECUTOR_ERROR_INVALID_BATCH_L2_DATA
    # exactly at the wall: passes the gate (executes the toy ROM fine)
    req = pb.ProcessBatchRequestV2(
        old_state_root=b"\x00" * 32,
        batch_l2_data=b"\x00" * impl.MAX_BATCH_L2_DATA_SIZE)
    resp = impl.process_batch_v2(req, None)
    assert resp.error != pb.EXECUTOR_ERROR_INVALID_BATCH_L2_DATA
