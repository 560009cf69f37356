"""hashdb64: TreeChunk codec + Smt64 + StateManager64 workflow.

The strongest oracle: the 64-ary chunked tree uses the classic SMT's node
semantics (leaf bubbling, zero-sibling intermediate hashing), so the
consolidated root for a key-value set must equal the classic smt.py root
for the same data.  Plus the reference's simple workflow shape
(test/service/hashdb/hashdb64_simple_workflow_test.cpp): sets with
virtual roots, gets at the overlay, finishTx/finishBlock, purge,
consolidate, read back through history.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.native import poseidon_permute
from xlayer_prover_tpu.state.database import MemoryDB
from xlayer_prover_tpu.state.hashdb64 import (Database64, Smt64,
                                              StateManager64, TreeChunk,
                                              key_bits6, remove_key_bits)
from xlayer_prover_tpu.state.smt import Smt, split_key


def _key_of(i: int):
    return tuple(poseidon_permute([i, 0, 0, 0, 0, 0, 0, 0,
                                   0, 0, 0, 0])[:4])


def test_key_bits6_matches_split_key():
    key = _key_of(77)
    bits = split_key(key)
    for level in (0, 6, 12, 42):
        v = key_bits6(key, level)
        expect = sum(bits[level + i] << i for i in range(6))
        assert v == expect, level


def test_remove_key_bits():
    key = (0b1101, 0b1010, 0b0111, 0b0001)
    # removing 4 bits drops one bit per limb
    assert remove_key_bits(key, 4) == (0b110, 0b101, 0b011, 0b000)
    # removing 6 bits: limbs 0,1 lose 2 bits; limbs 2,3 lose 1
    assert remove_key_bits(key, 6) == (0b11, 0b10, 0b011, 0b000)


def test_chunk_codec_roundtrip():
    chunk = TreeChunk(level=6)
    chunk.children[3].type = 2
    chunk.children[3].key = (1, 2, 3, 4)
    chunk.children[3].value = (1 << 200) + 99
    chunk.children[40].type = 3
    chunk.children[40].hash = (5, 6, 7, 8)
    data = chunk.encode()
    back = TreeChunk.decode(data, 6)
    assert back.children[3].type == 2
    assert back.children[3].key == (1, 2, 3, 4)
    assert back.children[3].value == (1 << 200) + 99
    assert back.children[40].type == 3
    assert back.children[40].hash == (5, 6, 7, 8)
    assert all(back.children[i].type == 1 for i in range(64)
               if i not in (3, 40))


def _classic_root(kvs):
    smt = Smt(MemoryDB())
    root = (0, 0, 0, 0)
    for k, v in kvs.items():
        root = smt.set(root, list(k), v).new_root
    return tuple(int(x) for x in root)


@pytest.mark.parametrize("n", [1, 2, 7, 40])
def test_smt64_root_matches_classic_smt(n):
    kvs = {_key_of(i): 1000 + i for i in range(n)}
    db = Database64()
    s64 = Smt64(db)
    root = s64.set_many((0, 0, 0, 0), kvs)
    assert root == _classic_root(kvs), n
    # point reads through the chunk walk
    for k, v in kvs.items():
        got, _lvl = s64.get(root, k)
        assert got == v
    miss, _ = s64.get(root, _key_of(10_000))
    assert miss == 0


def test_smt64_update_and_delete():
    kvs = {_key_of(i): i + 1 for i in range(5)}
    s64 = Smt64(Database64())
    root = s64.set_many((0, 0, 0, 0), kvs)
    root2 = s64.set_many(root, {_key_of(2): 777, _key_of(4): 0})
    expect = dict(kvs)
    expect[_key_of(2)] = 777
    del expect[_key_of(4)]
    assert root2 == _classic_root(expect)


def test_state_manager64_workflow():
    """The reference simple-workflow shape: 1 batch, 10 txs, 1 set each;
    virtual roots during the batch, consolidation at the end."""
    sm = StateManager64()
    uuid = "batch-1"
    expected = {}
    for tx in range(10):
        key = _key_of(tx)
        vroot = sm.set(uuid, key, 100 + tx)
        assert StateManager64.is_virtual_root(vroot)
        assert sm.get(uuid, key) == 100 + tx
        expected[key] = 100 + tx
        sm.finish_tx(uuid)
        sm.finish_block(uuid)
    sm.purge(uuid)
    root = sm.consolidate_state(uuid)
    assert not StateManager64.is_virtual_root(root)
    assert root == _classic_root(expected)
    # reads against the consolidated state (new batch overlay)
    for k, v in expected.items():
        assert sm.get("batch-2", k) == v
    # KV history version is readable
    packed = 0
    k0 = _key_of(0)
    for j in range(4):
        packed |= int(k0[j]) << (64 * j)
    assert sm.db.read_kv(1, packed) == 100


def test_state_manager64_rollback_and_cancel():
    sm = StateManager64()
    uuid = "b"
    sm.set(uuid, _key_of(1), 11)
    sm.finish_tx(uuid)
    sm.set(uuid, _key_of(2), 22)
    sm.rollback_tx(uuid)                 # tx 2 reverted
    root = sm.consolidate_state(uuid)
    assert root == _classic_root({_key_of(1): 11})
    sm.set("c", _key_of(3), 33)
    sm.cancel_batch("c")
    assert "c" not in sm.state


# ---------------------------------------------------------------------------
# production wiring: paged persistence + HashDB facade + service backend
# ---------------------------------------------------------------------------

def test_paged_store_roundtrip_and_reopen(tmp_path):
    """Chunks/programs persist through the PagedStore page log and survive
    a reopen from the same file (reference raw-data pages,
    src/hashdb64/page/raw_data_page.hpp)."""
    from xlayer_prover_tpu.state.hashdb64 import Database64

    path = str(tmp_path / "db64")
    db = Database64(path=path)
    big = bytes(range(256)) * 40          # > one 4 KB page, spans pages
    db.write_chunk((1, 2, 3, 4), b"chunk-a")
    db.write_chunk((5, 6, 7, 8), big)
    db.set_program((9, 9, 9, 9), b"bytecode")
    db.write_chunk((1, 2, 3, 4), b"chunk-a2")   # overwrite: latest wins
    db.flush()

    db2 = Database64(path=path)
    assert db2.read_chunk((1, 2, 3, 4)) == b"chunk-a2"
    assert db2.read_chunk((5, 6, 7, 8)) == big
    assert db2.get_program((9, 9, 9, 9)) == b"bytecode"
    assert db2.read_chunk((0, 0, 0, 1)) is None


def test_hashdb64_facade_virtual_and_consolidate(tmp_path):
    """HashDB64 set() returns virtual roots; consolidation produces the
    classic SMT root and persists it across a reopen."""
    from xlayer_prover_tpu.state.hashdb64 import (Database64, HashDB64,
                                                  StateManager64)

    path = str(tmp_path / "h64")
    h = HashDB64(path=path)
    kvs = {_key_of(i): 1000 + i for i in range(5)}
    root = (0, 0, 0, 0)
    for k, v in kvs.items():
        res = h.set("batch-1", root, k, v)
        root = res.new_root
        assert StateManager64.is_virtual_root(root)
    # reads through the overlay see uncommitted values
    assert h.get("batch-1", root, _key_of(3)).value == 1003
    real = h.consolidate("batch-1")
    assert real == _classic_root(kvs)

    # reopening the same path restores the consolidated tree
    h2 = HashDB64(path=path)
    v, _lvl = h2.sm.smt.get(real, _key_of(2))
    assert v == 1002


def test_hashdb_service_with_hashdb64_backend():
    """The HashDB gRPC service runs against the 64 backend: Set returns a
    virtual root, ConsolidateState resolves it to the real root."""
    from xlayer_prover_tpu.services.gen import hashdb_pb2 as pb
    from xlayer_prover_tpu.services.hashdb_service import (HashDBRemote,
                                                           HashDBServer,
                                                           HashDBServiceImpl,
                                                           _set_fea)
    from xlayer_prover_tpu.state.hashdb64 import (HashDB64, StateManager64)

    server = HashDBServer(HashDBServiceImpl(HashDB64())).start()
    try:
        client = HashDBRemote("127.0.0.1", server.port)
        res = client.set("b1", (0, 0, 0, 0), _key_of(1), 777)
        vroot = res.new_root
        assert StateManager64.is_virtual_root(vroot)
        cons_rpc = client._channel.unary_unary(
            "/hashdb.v1.HashDBService/ConsolidateState",
            request_serializer=pb.ConsolidateStateRequest.SerializeToString,
            response_deserializer=pb.ConsolidateStateResponse.FromString)
        creq = pb.ConsolidateStateRequest()
        _set_fea(creq.virtual_state_root, vroot)
        cresp = cons_rpc(creq)
        from xlayer_prover_tpu.services.hashdb_service import _fea
        real = _fea(cresp.consolidated_state_root)
        assert real != vroot
        assert real == _classic_root({_key_of(1): 777})
    finally:
        server.stop()


def test_consolidate_state_unknown_virtual_root_is_not_success():
    """ConsolidateState must NOT echo an unresolvable virtual root back as
    a consolidated root (reference returns an error code instead)."""
    from xlayer_prover_tpu.services.gen import hashdb_pb2 as pb
    from xlayer_prover_tpu.services.hashdb_service import (HashDBServer,
                                                           HashDBServiceImpl,
                                                           _set_fea)
    from xlayer_prover_tpu.state.hashdb64 import HashDB64, VIRTUAL_TAG

    server = HashDBServer(HashDBServiceImpl(HashDB64())).start()
    try:
        import grpc
        channel = grpc.insecure_channel(f"127.0.0.1:{server.port}")
        cons_rpc = channel.unary_unary(
            "/hashdb.v1.HashDBService/ConsolidateState",
            request_serializer=pb.ConsolidateStateRequest.SerializeToString,
            response_deserializer=pb.ConsolidateStateResponse.FromString)
        creq = pb.ConsolidateStateRequest()
        _set_fea(creq.virtual_state_root, (99, 99, 0, VIRTUAL_TAG))
        cresp = cons_rpc(creq)
        assert cresp.result.code == pb.ResultCode.CODE_DB_KEY_NOT_FOUND
    finally:
        server.stop()


def test_hashdb64_get_respects_requested_root():
    """A Get against an older real root must not observe the batch
    overlay's later writes; an unknown virtual root errors."""
    from xlayer_prover_tpu.state.hashdb64 import HashDB64, VIRTUAL_TAG

    h = HashDB64()
    # consolidate an initial state so there is a real historical root
    res = h.set("b0", (0, 0, 0, 0), _key_of(1), 111)
    root0 = h.consolidate("b0")
    # new batch writes over key 1
    res = h.set("b1", root0, _key_of(1), 222)
    vroot = res.new_root
    # read at the CURRENT virtual root sees the overlay
    assert h.get("b1", vroot, _key_of(1)).value == 222
    # read at the OLD real root sees the pre-batch value
    assert h.get("b1", root0, _key_of(1)).value == 111
    # an unknown virtual root is an error, not a silent latest-read
    import pytest
    with pytest.raises(KeyError):
        h.get("b1", (123, 456, 0, VIRTUAL_TAG), _key_of(1))
