"""Executor gRPC service over localhost: ProcessBatchV2 + GetFlushStatus."""

import numpy as np
import pytest

from xlayer_prover_tpu.executor.executor import Executor
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.services.executor_service import (ExecutorServer,
                                                         ExecutorServiceImpl,
                                                         make_client)
from xlayer_prover_tpu.services.gen import executor_pb2 as pb
from xlayer_prover_tpu.state.hashdb import HashDB


def _rom():
    # write 7 to storage slot 3, leaving a nonzero state root
    prog = [
        {"CONST": 3, "setC": 1},
        {"CONST": 7, "setD": 1},
        {"sWR": 1},
        {"CONST": 0},
    ]
    return Rom.from_json({"program": prog,
                          "labels": {"start": 0, "finalizeExecution": 3},
                          "constants": {}})


@pytest.fixture(scope="module")
def service():
    ex = Executor(_rom(), n_bits=11, max_steps=20)
    impl = ExecutorServiceImpl(ex, HashDB())
    server = ExecutorServer(impl).start()
    yield server, impl
    server.stop()


def test_process_batch_v2(service):
    server, impl = service
    process, flush, _stateless = make_client(server.port)
    req = pb.ProcessBatchRequestV2(old_state_root=b"\x00" * 32,
                                   batch_l2_data=b"\x01\x02")
    resp = process(req)
    assert resp.error == pb.EXECUTOR_ERROR_NO_ERROR
    assert resp.new_state_root != b"\x00" * 32
    assert resp.cnt_steps > 0
    # one sWR on the empty tree: 2 leaf hashes (value + node,
    # smt.cpp:1052-1056 counting) + 2 key-derivation permutations
    assert resp.cnt_poseidon_hashes == 4

    from google.protobuf import empty_pb2
    status = flush(empty_pb2.Empty())
    assert status.last_flush_id >= 1
    assert status.stored_flush_id == status.last_flush_id


def test_process_batch_error_path(service):
    """A ROM failure must return an executor error, not crash."""
    server, impl = service
    # swap in an executor whose ROM asserts falsely
    bad_prog = [{"CONST": 1, "setA": 1}, {"CONST": 2, "assert": 1},
                {"CONST": 0}]
    bad_rom = Rom.from_json({"program": bad_prog,
                             "labels": {"start": 0, "finalizeExecution": 2},
                             "constants": {}})
    old = impl.executor
    impl.executor = Executor(bad_rom, n_bits=11, max_steps=10)
    try:
        process, _, _sb = make_client(server.port)
        resp = process(pb.ProcessBatchRequestV2(old_state_root=b"\x00" * 32))
        assert resp.error == pb.EXECUTOR_ERROR_UNSPECIFIED
    finally:
        impl.executor = old


def test_full_tracer_events():
    """FullTracer collects batch/block/tx structure from eventLog hooks."""
    from xlayer_prover_tpu.executor.full_tracer import FullTracer
    from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor import rom_functions as rf
    from xlayer_prover_tpu.state.hashdb import HashDB

    def ev(name):
        return {"op": "functionCall", "funcName": "eventLog",
                "params": [{"op": "getVar", "varName": name}]}

    prog = [
        {"cmdBefore": [ev("onStartBatch")]},
        {"cmdBefore": [ev("onStartBlock")]},
        {"cmdBefore": [ev("onProcessTx")], "CONSTL": 77, "setSR": 1},
        {"cmdBefore": [ev("onFinishTx")]},
        {"cmdBefore": [ev("onFinishBlock")]},
        {"cmdBefore": [ev("onFinishBatch")],
         "cmdAfter": [{"op": "functionCall", "funcName": "eventLog",
                       "params": [{"op": "getVar", "varName": "onError"},
                                  {"op": "getVar", "varName": "invalidRLP"}]}]},
        {"JMP": 1, "useJmpAddr": 1, "jmpAddr": 7},
        {},
    ]
    rom = Rom.from_json({"program": prog,
                         "labels": {"start": 0, "finalizeExecution": 7},
                         "constants": {}})
    ex = MainExecutor(rom, max_steps=64)
    rf.register_all(ex)
    ctx = Context(rom, HashDB())
    ctx.full_tracer = FullTracer(rom)
    ex.execute(ctx)
    batch = ctx.full_tracer.batch
    assert len(batch.blocks) == 1
    assert len(batch.blocks[0].responses) == 1
    tx = batch.blocks[0].responses[0]
    assert tx.state_root == 77
    assert batch.new_state_root == 77
    assert batch.error == "" or batch.invalid_batch in (True, False)


def test_trace_config_opcode_steps():
    """TraceConfigV2 -> per-opcode TransactionStepV2 records (reference
    full_tracer.cpp onOpcode + trace_config.hpp gating)."""
    from xlayer_prover_tpu.executor.full_tracer import (FullTracer,
                                                        TraceConfig)

    class Regs:
        GAS = 99_000
        SR = [1, 0, 0, 0, 0, 0, 0, 0]
        CTX = 1
        SP = 2

    class Ctx:
        regs = Regs()
        mem = {}

    ctx = Ctx()
    base_stack = 1 * FullTracer.CTX_OFFSET + FullTracer.STACK_OFFSET
    ctx.mem[base_stack] = [5, 0, 0, 0, 0, 0, 0, 0]
    ctx.mem[base_stack + 1] = [6, 0, 0, 0, 0, 0, 0, 0]

    cfg = TraceConfig(enabled=True, enable_memory=True)
    tr = FullTracer(trace_config=cfg)
    tr.on_start_block(ctx, [])
    tr.on_process_tx(ctx, [])
    assert tr.current_tx.full_trace
    tr.on_opcode(ctx, [0x60])           # PUSH1
    ctx.regs.GAS = 98_997
    tr.on_opcode(ctx, [0x01])           # ADD
    tx = tr.current_tx
    assert len(tx.steps) == 2
    assert tx.steps[0].op == 0x60 and tx.steps[1].op == 0x01
    assert tx.steps[0].gas_cost == 3    # retro-filled from the gas delta
    assert tx.steps[0].stack == [5, 6]  # CTX-relative stack snapshot
    assert tx.steps[0].depth == 1
    # call-depth tracking
    tr.on_opcode(ctx, [0xF1])           # CALL
    tr.on_opcode(ctx, [0x01])
    assert tx.steps[-1].depth == 2
    tr.on_opcode(ctx, [0xF3])           # RETURN
    tr.on_opcode(ctx, [0x01])
    assert tx.steps[-1].depth == 1

    # gating: disabled stack, no config -> no steps
    tr2 = FullTracer(trace_config=TraceConfig(enabled=True,
                                              disable_stack=True))
    tr2.on_start_block(ctx, [])
    tr2.on_process_tx(ctx, [])
    tr2.on_opcode(ctx, [0x60])
    assert tr2.current_tx.steps[0].stack == []
    tr3 = FullTracer()                  # tracing off by default
    tr3.on_start_block(ctx, [])
    tr3.on_process_tx(ctx, [])
    tr3.on_opcode(ctx, [0x60])
    assert tr3.current_tx.steps == []
    assert tr3.current_tx.opcodes == 1

    # per-tx-hash selection
    cfg4 = TraceConfig(enabled=True, tx_hash_to_generate_full_trace=1234)
    tr4 = FullTracer(trace_config=cfg4)
    tr4.on_start_block(ctx, [])
    tr4.on_process_tx(ctx, [])          # txHash var missing -> 0 != 1234
    assert not tr4.current_tx.full_trace


def test_multithread_client_drivers(service, tmp_path):
    """runExecutorClientMultithread (executor_client.cpp): N concurrent
    client threads each loop ProcessBatchV2 against one server — the
    service must answer every request correctly under concurrency."""
    import json

    from xlayer_prover_tpu.main import cmd_executor_client
    from xlayer_prover_tpu.utils.config import Config

    server, impl = service
    inp = tmp_path / "client_input.json"
    inp.write_text(json.dumps({
        "oldStateRoot": "0x" + "00" * 32,
        "oldAccInputHash": "0x" + "00" * 32,
        "batchL2Data": "0x0102",
        "chainID": 1, "forkID": 9,
    }))
    cfg = Config()
    cfg.run_executor_client_multithread = True
    cfg.input_file = str(inp)
    cfg.executor_client_host = "127.0.0.1"
    cfg.executor_client_port = server.port
    cfg.executor_client_loops = 3
    cfg.max_executor_threads = 4
    rc = cmd_executor_client(cfg)
    assert rc == 0
