"""Database warm-start story: loadDb2MemCache boot warmer, the
readTreeRemote bulk subtree read (recursive CTE), the dbStateRootKey
sentinel, and the dbCacheSynchThread remote-cache mirror.

Reference: src/main.cpp:404-440, src/hashdb/database.cpp:27-28 +
:1872-1966 (dbCacheSynchThread) + :1968-2126 (loadDb2MemCache),
database.hpp:64 (readTreeRemote).
"""

import time

from xlayer_prover_tpu.state.database import (STATE_ROOT_KEY,
                                              CachedDB, CacheSynchThread,
                                              MemoryDB, SqlDB,
                                              load_db_to_mem_cache)
from xlayer_prover_tpu.state.hashdb import HashDB
from xlayer_prover_tpu.state.smt import Smt


def _build_state(db):
    """Insert a few keys through the SMT and return the final root."""
    smt = Smt(db)
    root = (0, 0, 0, 0)
    for k in range(1, 9):
        key = (k, k * 7, k * 13, k * 29)
        root = smt.set(root, key, 1000 + k).new_root
    return root


def test_state_root_sentinel_roundtrip():
    db = CachedDB(backend=MemoryDB())
    assert db.read_state_root() is None
    db.update_state_root((5, 6, 7, 8))
    assert db.read_state_root() == (5, 6, 7, 8)
    # the sentinel never collides with a real Poseidon output key space
    assert STATE_ROOT_KEY == (0xFFFFFFFFFFFFFFFF,) * 4


def test_load_db_to_mem_cache_bfs():
    backend = MemoryDB()
    db = CachedDB(backend=backend)
    root = _build_state(db)
    db.update_state_root(root)
    db.flush()
    db.multi_write.wait_stored(1, timeout=5.0)

    # cold restart: fresh cache stack over the same backend
    cold = CachedDB(backend=backend)
    n = load_db_to_mem_cache(cold)
    assert n > 8  # 8 leaves + branches + value nodes
    # every warmed node is now a cache hit, no backend read
    before = backend.reads
    assert cold.read(root) is not None
    assert backend.reads == before


def test_load_db_to_mem_cache_empty_db():
    db = CachedDB(backend=MemoryDB())
    assert load_db_to_mem_cache(db) == 0


def test_sql_read_tree_bulk():
    sql = SqlDB(":memory:")
    db = CachedDB(backend=sql)
    root = _build_state(db)
    db.flush()
    db.multi_write.wait_stored(1, timeout=5.0)

    # one SQL round trip returns the whole subtree
    tree = sql.read_tree(root)
    assert root in tree
    assert len(tree) > 8
    # warm start through the bulk path
    cold = CachedDB(backend=sql)
    n = load_db_to_mem_cache(cold, root4=root)
    assert n == len(tree)
    before = sql.reads
    assert cold.read(root) is not None
    assert sql.reads == before


def test_sql_legacy_payload_still_readable():
    sql = SqlDB(":memory:")
    sql._conn.execute(
        "INSERT INTO nodes (hash, data) VALUES (?, ?)",
        ("00" * 32, ",".join("%x" % v for v in range(12))))
    assert sql.read((0, 0, 0, 0)) == list(range(12))


class _FakeRemote:
    """get_flush_data stub standing in for a remote prover's HashDB."""

    def __init__(self):
        self.generations = {}
        self.stored = 0

    def seal(self, nodes, programs):
        self.stored += 1
        self.generations[self.stored] = (nodes, programs)

    def get_flush_data(self, flush_id):
        nodes, programs = self.generations.get(flush_id, ({}, {}))
        return self.stored, nodes, programs


def test_cache_synch_thread_mirrors_remote_flushes():
    db = CachedDB(backend=MemoryDB())
    remote = _FakeRemote()
    remote.seal({(1, 2, 3, 4): list(range(12))}, {(9, 9, 9, 9): b"\x60\x00"})
    synch = CacheSynchThread(db, remote, poll_s=0.01)
    try:
        deadline = time.monotonic() + 5.0
        while synch.synced_nodes < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        remote.seal({(5, 6, 7, 8): list(range(12, 24))}, {})
        while synch.synced_nodes < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
    finally:
        synch.stop()
    assert synch.synced_nodes == 2
    assert synch.synced_programs == 1
    # mirrored into the CACHES only: reads hit, backend untouched
    assert db.read((1, 2, 3, 4)) == list(range(12))
    assert db.read((5, 6, 7, 8)) == list(range(12, 24))
    assert db.get_program((9, 9, 9, 9)) == b"\x60\x00"
    assert db.backend.nodes == {}
    assert db.backend.programs == {}


def test_consolidate_persists_state_root_sentinel():
    db = CachedDB(backend=MemoryDB())
    h = HashDB(db=db)
    uuid = "b1"
    res = h.set(uuid, (0, 0, 0, 0), (1, 2, 3, 4), 777)
    h.consolidate(uuid)
    db.multi_write.wait_stored(1, timeout=5.0)
    assert db.read_state_root() == tuple(res.new_root)
