"""Executor gRPC service: the sequencer's ProcessBatch fast path.

Wire-compatible with the reference ExecutorService
(src/grpc/proto/executor.proto; impl src/service/executor/
executor_service.cpp): ProcessBatchV2 runs the Main SM without trace
expansion on the caller's gRPC thread (concurrent batches — the reference
explicitly does NOT queue these, SURVEY §3.3) and returns the new state
root + resource counters; GetFlushStatus reports state write-back progress.

The EVM semantics come from the configured ROM + function registry; batches
beyond the implemented command surface return an executor error rather than
wrong results.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import grpc
from google.protobuf import empty_pb2

from ..executor.executor import Executor
from ..executor.main_sm import fea_to_scalar
from ..state.hashdb import HashDB
from ..utils.log import zklog
from ..utils.zkresult import ZkError
from .gen import executor_pb2 as pb

SERVICE = "executor.v1.ExecutorService"


class ExecutorServiceImpl:
    def __init__(self, executor: Executor, hashdb: HashDB):
        self.executor = executor
        self.hashdb = hashdb
        self.stored_flush_id = 0
        self.flushes = 0

    # -- RPC handlers ---------------------------------------------------
    def process_batch_v2(self, request, context):
        resp = pb.ProcessBatchResponseV2()
        uuid = f"pb-{id(request):x}-{self.flushes}"
        try:
            old_root = int.from_bytes(request.old_state_root, "big")
            ctx = self.executor.process_batch(
                self.hashdb, batch_uuid=uuid,
                input_vars={"oldStateRoot": old_root,
                            "batchL2Data": request.batch_l2_data.hex()})
            new_root = 0
            for i, limb in enumerate(ctx.regs.SR):
                new_root |= int(limb) << (32 * i)
            resp.new_state_root = new_root.to_bytes(32, "big")
            resp.cnt_keccak_hashes = ctx.counters.keccak_f
            resp.cnt_poseidon_hashes = ctx.counters.poseidon_g
            resp.cnt_arithmetics = ctx.counters.arith
            resp.cnt_binaries = ctx.counters.binary
            resp.cnt_steps = ctx.counters.steps
            resp.cnt_mem_aligns = ctx.counters.mem_align
            resp.error = pb.EXECUTOR_ERROR_NO_ERROR
            self.flushes += 1
            resp.flush_id = self.flushes
            resp.stored_flush_id = self.stored_flush_id
            self.hashdb.consolidate(uuid)
            self.stored_flush_id = self.flushes
        except ZkError as e:
            zklog.error(f"executor service: {e}")
            self.hashdb.discard(uuid)
            resp.error = pb.EXECUTOR_ERROR_UNSPECIFIED
        except Exception as e:  # noqa: BLE001
            zklog.error(f"executor service: {e}")
            self.hashdb.discard(uuid)
            resp.error = pb.EXECUTOR_ERROR_UNSPECIFIED
        return resp

    def get_flush_status(self, request, context):
        resp = pb.GetFlushStatusResponse()
        resp.stored_flush_id = self.stored_flush_id
        resp.last_flush_id = self.flushes
        resp.pending_to_flush_nodes = 0
        resp.pending_to_flush_program = 0
        return resp


class ExecutorServer:
    """gRPC server wrapper (hand-registered method handlers)."""

    def __init__(self, impl: ExecutorServiceImpl, port: int = 0):
        self.impl = impl
        self._server = grpc.server(ThreadPoolExecutor(max_workers=8))
        handlers = {
            "ProcessBatchV2": grpc.unary_unary_rpc_method_handler(
                impl.process_batch_v2,
                request_deserializer=pb.ProcessBatchRequestV2.FromString,
                response_serializer=pb.ProcessBatchResponseV2.SerializeToString,
            ),
            "GetFlushStatus": grpc.unary_unary_rpc_method_handler(
                impl.get_flush_status,
                request_deserializer=empty_pb2.Empty.FromString,
                response_serializer=pb.GetFlushStatusResponse.SerializeToString,
            ),
        }
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(SERVICE, handlers),))
        self.port = self._server.add_insecure_port(f"127.0.0.1:{port}")

    def start(self):
        self._server.start()
        return self

    def stop(self):
        self._server.stop(1.0)


def make_client(port: int):
    """Returns (process_batch_v2, get_flush_status) callables."""
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    pb_call = channel.unary_unary(
        f"/{SERVICE}/ProcessBatchV2",
        request_serializer=pb.ProcessBatchRequestV2.SerializeToString,
        response_deserializer=pb.ProcessBatchResponseV2.FromString)
    fs_call = channel.unary_unary(
        f"/{SERVICE}/GetFlushStatus",
        request_serializer=empty_pb2.Empty.SerializeToString,
        response_deserializer=pb.GetFlushStatusResponse.FromString)
    return pb_call, fs_call
