"""The full HashDBService RPC surface over localhost gRPC.

Covers the eight RPCs beyond the basic Set/Get/program/flush set
(reference hashdb.proto service block / hashdb_interface.hpp:21-40):
GetLatestStateRoot, StartBlock, FinishBlock, FinishTx, GetFlushData,
ReadTree, ResetDB, plus ConsolidateState error semantics.
"""

import grpc
import pytest
from google.protobuf import empty_pb2

from xlayer_prover_tpu.services.gen import hashdb_pb2 as pb
from xlayer_prover_tpu.services.hashdb_service import (SERVICE, HashDBServer,
                                                       HashDBServiceImpl,
                                                       _fea, _set_fea)
from xlayer_prover_tpu.state.database import CachedDB
from xlayer_prover_tpu.state.hashdb import HashDB


def _rpc(channel, name, req_cls, resp_cls):
    return channel.unary_unary(
        f"/{SERVICE}/{name}",
        request_serializer=req_cls.SerializeToString,
        response_deserializer=resp_cls.FromString)


@pytest.fixture()
def stack():
    impl = HashDBServiceImpl(HashDB(CachedDB()))
    server = HashDBServer(impl).start()
    channel = grpc.insecure_channel(f"127.0.0.1:{server.port}")
    yield server, impl, channel
    server.stop()


def _set(channel, uuid, old_root, key, value):
    rpc = _rpc(channel, "Set", pb.SetRequest, pb.SetResponse)
    req = pb.SetRequest(batch_uuid=uuid, value=f"{value:x}")
    _set_fea(req.old_root, old_root)
    _set_fea(req.key, key)
    resp = rpc(req)
    assert resp.result.code == pb.ResultCode.CODE_SUCCESS
    return _fea(resp.new_root)


def test_latest_root_block_tx_and_flush_data(stack):
    server, impl, channel = stack
    latest = _rpc(channel, "GetLatestStateRoot", empty_pb2.Empty,
                  pb.GetLatestStateRootResponse)
    assert _fea(latest(empty_pb2.Empty()).latest_root) == (0, 0, 0, 0)

    start_block = _rpc(channel, "StartBlock", pb.StartBlockRequest,
                       empty_pb2.Empty)
    finish_tx = _rpc(channel, "FinishTx", pb.FinishTxRequest,
                     empty_pb2.Empty)
    finish_block = _rpc(channel, "FinishBlock", pb.FinishBlockRequest,
                        empty_pb2.Empty)
    start_block(pb.StartBlockRequest(batch_uuid="b1", old_state_root="0x0"))
    root = _set(channel, "b1", (0, 0, 0, 0), (1, 0, 0, 0), 7)
    finish_tx(pb.FinishTxRequest(batch_uuid="b1", new_state_root="0x1"))
    finish_block(pb.FinishBlockRequest(batch_uuid="b1",
                                       new_state_root="0x1"))

    # consolidate via Flush, then the latest root is published
    flush = _rpc(channel, "Flush", pb.FlushRequest, pb.FlushResponse)
    fresp = flush(pb.FlushRequest(batch_uuid="b1"))
    assert fresp.result.code == pb.ResultCode.CODE_SUCCESS
    assert _fea(latest(empty_pb2.Empty()).latest_root) == root

    # the sealed write-behind generation is recoverable over the wire
    gfd = _rpc(channel, "GetFlushData", pb.GetFlushDataRequest,
               pb.GetFlushDataResponse)
    resp = gfd(pb.GetFlushDataRequest(flush_id=fresp.flush_id))
    assert resp.result.code == pb.ResultCode.CODE_SUCCESS
    assert len(resp.nodes) > 0
    for k, v in resp.nodes.items():
        assert len(k) == 64 and len(v) == 12 * 16


def test_read_tree_returns_values_and_nodes(stack):
    server, impl, channel = stack
    root = (0, 0, 0, 0)
    keys = [(i, 0, 0, 0) for i in range(1, 4)]
    for i, k in enumerate(keys):
        root = _set(channel, "rb", root, k, 100 + i)
    flush = _rpc(channel, "Flush", pb.FlushRequest, pb.FlushResponse)
    flush(pb.FlushRequest(batch_uuid="rb"))

    rt = _rpc(channel, "ReadTree", pb.ReadTreeRequest, pb.ReadTreeResponse)
    req = pb.ReadTreeRequest()
    _set_fea(req.state_root, root)
    for k in keys + [(99, 0, 0, 0)]:        # one missing key
        _set_fea(req.keys.add(), k)
    resp = rt(req)
    assert resp.result.code == pb.ResultCode.CODE_SUCCESS
    values = {tuple(_fea(kv.key)): int(kv.value, 16)
              for kv in resp.key_value}
    for i, k in enumerate(keys):
        assert values[k] == 100 + i
    assert values[(99, 0, 0, 0)] == 0
    # the touched sub-trie nodes ride along (leaf + value nodes at least)
    assert len(resp.hash_value) >= len(keys)
    for hv in resp.hash_value:
        node = [hv.value.fe0, hv.value.fe1, hv.value.fe2, hv.value.fe3,
                hv.value.fe4, hv.value.fe5, hv.value.fe6, hv.value.fe7,
                hv.value.fe8, hv.value.fe9, hv.value.fe10, hv.value.fe11]
        assert any(int(v) for v in node)


def test_reset_db_drops_everything(stack):
    server, impl, channel = stack
    root = _set(channel, "rz", (0, 0, 0, 0), (5, 0, 0, 0), 42)
    flush = _rpc(channel, "Flush", pb.FlushRequest, pb.FlushResponse)
    flush(pb.FlushRequest(batch_uuid="rz"))
    reset = _rpc(channel, "ResetDB", empty_pb2.Empty, pb.ResetDBResponse)
    assert reset(empty_pb2.Empty()).result.code == \
        pb.ResultCode.CODE_SUCCESS
    latest = _rpc(channel, "GetLatestStateRoot", empty_pb2.Empty,
                  pb.GetLatestStateRootResponse)
    assert _fea(latest(empty_pb2.Empty()).latest_root) == (0, 0, 0, 0)
    # the old root is gone
    get = _rpc(channel, "Get", pb.GetRequest, pb.GetResponse)
    req = pb.GetRequest()
    _set_fea(req.root, root)
    _set_fea(req.key, (5, 0, 0, 0))
    assert get(req).result.code != pb.ResultCode.CODE_SUCCESS


def test_finish_tx_enables_revert(stack):
    """finishTx seals a substate; revert_tx rolls the overlay back to it
    (the reference stateManager tx-rollback path)."""
    server, impl, channel = stack
    root1 = _set(channel, "tx", (0, 0, 0, 0), (1, 0, 0, 0), 1)
    impl.hashdb.finish_tx("tx", root1)
    root2 = _set(channel, "tx", root1, (2, 0, 0, 0), 2)
    assert root2 != root1
    impl.hashdb.revert_tx("tx")
    # after rollback the second write's nodes are gone from the overlay
    get = _rpc(channel, "Get", pb.GetRequest, pb.GetResponse)
    req = pb.GetRequest(batch_uuid="tx")
    _set_fea(req.root, root1)
    _set_fea(req.key, (1, 0, 0, 0))
    resp = get(req)
    assert resp.result.code == pb.ResultCode.CODE_SUCCESS
    assert int(resp.value, 16) == 1
