"""PostgresDB against a wire-faithful fake: the fake enforces the
reference's exact query shapes (SELECT * FROM state.nodes WHERE hash =
E'\\x..'; INSERT .. ON CONFLICT (hash) DO NOTHING, database.cpp:564,757)
and stores rows in sqlite, so the backend's SQL surface is pinned even
without a live server (psycopg2 is not bundled in this image)."""

import re
import sqlite3

import pytest

from xlayer_prover_tpu.state.database import CachedDB
from xlayer_prover_tpu.state.postgres import (ConnectionPool, PostgresDB,
                                              _key_hex)

_SELECT = re.compile(
    r"^SELECT \* FROM (state\.\w+) WHERE hash = E'\\\\x([0-9a-f]+)';$")
_INSERT = re.compile(
    r"^INSERT INTO (state\.\w+) \( hash, data \) VALUES "
    r"\( E'\\\\x([0-9a-f]+)', E'\\\\x([0-9a-f]+)' \) "
    r"ON CONFLICT \(hash\) DO NOTHING;$")


class FakeCursor:
    def __init__(self, conn):
        self.conn = conn
        self._rows = None

    def execute(self, query):
        self.conn.fail_hook()
        m = _SELECT.match(query)
        if m:
            table, key = m.groups()
            cur = self.conn.sql.execute(
                "SELECT hash, data FROM t WHERE tbl = ? AND hash = ?",
                (table, key))
            self._rows = [(bytes.fromhex(h), bytes.fromhex(d))
                          for (h, d) in cur.fetchall()]
            return
        m = _INSERT.match(query)
        if m:
            table, key, data = m.groups()
            self.conn.sql.execute(
                "INSERT OR IGNORE INTO t (tbl, hash, data) VALUES (?,?,?)",
                (table, key, data))
            self._rows = None
            return
        raise AssertionError(f"query shape not reference-compatible: "
                             f"{query!r}")

    def fetchall(self):
        return self._rows

    def close(self):
        pass


class FakeConn:
    """DBAPI-ish connection over one shared sqlite store."""

    def __init__(self, store, fail_hook=lambda: None):
        self.sql = store
        self.fail_hook = fail_hook
        self.closed = False

    def cursor(self):
        return FakeCursor(self)

    def close(self):
        self.closed = True


@pytest.fixture()
def store():
    sql = sqlite3.connect(":memory:", check_same_thread=False)
    sql.execute("CREATE TABLE t (tbl TEXT, hash TEXT, data TEXT, "
                "PRIMARY KEY (tbl, hash))")
    return sql


def test_postgres_read_write_roundtrip(store):
    db = PostgresDB(connection_factory=lambda: FakeConn(store))
    key = (1, 2, 3, 4)
    value = list(range(12))
    assert db.read(key) is None
    db.write(key, value)
    assert db.read(key) == value
    # ON CONFLICT DO NOTHING: re-write with different data keeps first
    db.write(key, [9] * 12)
    assert db.read(key) == value
    db.set_program((5, 6, 7, 8), b"\x60\x80\x60\x40")
    assert db.get_program((5, 6, 7, 8)) == b"\x60\x80\x60\x40"
    assert db.get_program((0, 0, 0, 9)) is None


def test_postgres_retry_rebuilds_connection(store):
    fails = {"n": 2}

    def hook():
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ConnectionError("connection dropped")

    db = PostgresDB(connection_factory=lambda: FakeConn(store, hook),
                    read_retries=3, retry_delay_s=0)
    db.write((1, 1, 1, 1), list(range(12)))       # survives 2 failures
    assert db.read((1, 1, 1, 1)) == list(range(12))


def test_postgres_behind_cached_db(store):
    """PostgresDB drops in behind the cache + MultiWrite stack."""
    backend = PostgresDB(connection_factory=lambda: FakeConn(store))
    c = CachedDB(backend=backend)
    c.write((7, 7, 7, 7), list(range(12)))
    fid, _ = c.flush()
    assert c.multi_write.wait_stored(fid)
    assert backend.read((7, 7, 7, 7)) == list(range(12))
    # cache hit does not re-query
    reads_before = backend.reads
    assert c.read((7, 7, 7, 7)) == list(range(12))
    assert backend.reads == reads_before


def test_pool_reuses_and_disposes(store):
    made = {"n": 0}

    def factory():
        made["n"] += 1
        return FakeConn(store)

    pool = ConnectionPool(factory, size=2)
    a = pool.acquire()
    pool.release(a)
    b = pool.acquire()
    assert b is a and made["n"] == 1     # reused
    pool.release(b, broken=True)
    assert b.closed
    c = pool.acquire()
    assert made["n"] == 2                # rebuilt after dispose
