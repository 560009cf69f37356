"""writeTree: bulk key-value -> new root on both state backends
(HashDBInterface::writeTree, hashdb_interface.hpp:38; backend impl
Database64::WriteTree, database_64.cpp:298-430)."""

import numpy as np
import pytest

from xlayer_prover_tpu.state.database import MemoryDB
from xlayer_prover_tpu.state.hashdb import HashDB
from xlayer_prover_tpu.state.hashdb64 import HashDB64
from xlayer_prover_tpu.state.smt import ZERO4, Smt


def rand_kvs(rng, n):
    out = []
    for _ in range(n):
        k = tuple(int(v) for v in rng.integers(0, 1 << 63, size=4,
                                               dtype=np.uint64))
        out.append((k, int(rng.integers(1, 1 << 60))))
    return out


def test_write_tree_matches_sequential_sets(rng):
    kvs = rand_kvs(rng, 12)
    h = HashDB(MemoryDB())
    root_bulk = h.write_tree(ZERO4, kvs)

    ref_db = MemoryDB()
    smt = Smt(ref_db)
    root_seq = ZERO4
    for k, v in kvs:
        root_seq = tuple(smt.set(root_seq, k, v).new_root)
    assert root_bulk == root_seq
    # persisted: readable without an overlay, latest root advanced
    for k, v in kvs:
        assert h.get(None, root_bulk, k).value == v
    assert h.get_latest_state_root() == root_bulk


def test_write_tree_non_persistent_leaves_db_untouched(rng):
    kvs = rand_kvs(rng, 4)
    db = MemoryDB()
    h = HashDB(db)
    root = h.write_tree(ZERO4, kvs, persistent=False)
    assert any(root)
    assert len(db.nodes) == 0
    # reads resolve through the staging overlay
    assert h.get("__writeTree__", root, kvs[0][0]).value == kvs[0][1]


def test_write_tree_then_read_tree_roundtrip(rng):
    """The stateless-flow pairing: writeTree imports state, readTree
    exports the sub-trie at the resulting root."""
    kvs = rand_kvs(rng, 6)
    h = HashDB(MemoryDB())
    root = h.write_tree(ZERO4, kvs)
    key_values, _hashes = h.read_tree(root, [k for k, _v in kvs])
    got = {tuple(kv[0]): kv[1] for kv in key_values}
    for k, v in kvs:
        assert got[k] == v


def test_write_tree_hashdb64_versions(rng, tmp_path):
    kvs1 = rand_kvs(rng, 5)
    kvs2 = rand_kvs(rng, 3)
    h = HashDB64(path=str(tmp_path / "wt64"))
    root1 = h.write_tree(ZERO4, kvs1)
    assert any(root1)
    # second bulk write must chain from the latest consolidated root
    root2 = h.write_tree(root1, kvs2)
    assert root2 != root1
    for k, v in kvs1 + kvs2:
        assert h.sm.smt.get(root2, k)[0] == v
    # a stale old root is rejected (database_64.cpp:344-348)
    with pytest.raises(ValueError):
        h.write_tree(root1, kvs2)
    # and an empty write is rejected (database_64.cpp:306-310)
    with pytest.raises(ValueError):
        h.write_tree(root2, [])
