"""Database caches + MultiWrite write-behind (reference
database_cache.hpp, database_associative_cache.hpp, multi_write.hpp):
LRU byte budgets, associative overwrite, flush-id generations, the
sender thread, read-through of pending writes, and the SMT running on
the cached stack end to end.
"""

import numpy as np

from xlayer_prover_tpu.state.database import (AssociativeCache, CachedDB,
                                              LRUCache, MemoryDB)


def _key(i):
    return (i, i + 1, i + 2, i + 3)


def test_lru_eviction_by_bytes():
    c = LRUCache(max_bytes=3 * (32 + 8 * 12))
    for i in range(5):
        c.put(_key(i), [i] * 12)
    assert len(c) == 3
    assert c.get(_key(0)) is None          # evicted
    assert c.get(_key(4)) == [4] * 12
    # touching 2 keeps it alive over 3
    c.get(_key(2))
    c.put(_key(9), [9] * 12)
    assert c.get(_key(2)) is not None
    assert c.get(_key(3)) is None


def test_associative_overwrite():
    c = AssociativeCache(index_bits=2)      # 4 slots: collisions certain
    for i in range(16):
        c.put(_key(i), [i])
    found = sum(1 for i in range(16) if c.get(_key(i)) is not None)
    assert 1 <= found <= 4                  # direct-mapped: last per slot


def test_cached_db_read_through_and_hit():
    backend = MemoryDB()
    db = CachedDB(backend, mt_cache_bytes=1 << 16)
    backend.write(_key(1), list(range(12)))
    r0 = backend.reads
    assert db.read(_key(1)) == list(range(12))
    assert backend.reads == r0 + 1
    for _ in range(5):
        assert db.read(_key(1)) == list(range(12))
    assert backend.reads == r0 + 1          # served from cache


def test_multiwrite_flush_generations():
    backend = MemoryDB()
    db = CachedDB(backend)
    db.write(_key(7), [7] * 12)
    # pending write readable before any flush, backend untouched
    assert db.read(_key(7)) == [7] * 12
    assert backend.read(_key(7)) is None
    fid, stored = db.flush()
    assert fid == 1
    assert db.multi_write.wait_stored(fid)
    assert backend.read(_key(7)) == [7] * 12
    st = db.flush_status()
    assert st["stored_flush_id"] == 1
    assert st["pending_nodes"] == 0
    # second generation
    db.set_program(_key(8), b"\x01\x02")
    fid2, _ = db.flush()
    assert fid2 == 2
    assert db.multi_write.wait_stored(fid2)
    assert backend.get_program(_key(8)) == b"\x01\x02"
    # flush with nothing pending does not create a generation
    fid3, stored3 = db.flush()
    assert fid3 == 2 and stored3 == 2


def test_smt_on_cached_db():
    """The SMT state layer runs unchanged over the cached stack."""
    from xlayer_prover_tpu.state.hashdb import HashDB
    backend = MemoryDB()
    hdb = HashDB(CachedDB(backend))
    root = (0, 0, 0, 0)
    uuid = "b1"
    for k in range(1, 6):
        res = hdb.set(uuid, root, (k, 0, 0, 0), 1000 + k)
        root = res.new_root
    for k in range(1, 6):
        assert hdb.get(uuid, root, (k, 0, 0, 0)).value == 1000 + k
    out = hdb.consolidate(uuid)
    assert isinstance(out, tuple)
    fid, _ = out
    assert hdb.db.multi_write.wait_stored(fid)
    assert len(backend.nodes) > 0
    # reads after consolidation come straight from the cached stack
    assert hdb.get(None, root, (3, 0, 0, 0)).value == 1003


def test_sql_db_roundtrip(tmp_path):
    """SQL-backed node/program store (reference Database over Postgres;
    sqlite carries the SQL path here) incl. persistence + cached stack."""
    from xlayer_prover_tpu.state.database import SqlDB
    path = str(tmp_path / "state.db")
    db = SqlDB(path)
    db.write(_key(1), list(range(12)))
    db.set_program(_key(2), b"\xde\xad")
    db.flush()
    db2 = SqlDB(path)
    assert db2.read(_key(1)) == list(range(12))
    assert db2.get_program(_key(2)) == b"\xde\xad"
    assert db2.read(_key(9)) is None
    # the SMT + cached stack run over SQL end to end
    from xlayer_prover_tpu.state.hashdb import HashDB
    hdb = HashDB(CachedDB(db2))
    root = (0, 0, 0, 0)
    res = hdb.set("b", root, (5, 0, 0, 0), 777)
    assert hdb.get("b", res.new_root, (5, 0, 0, 0)).value == 777
