"""HashDB facade: overlay, tx rollback, consolidation, programs."""

import numpy as np

from xlayer_prover_tpu.state.database import MemoryDB
from xlayer_prover_tpu.state.hashdb import HashDB
from xlayer_prover_tpu.state.smt import ZERO4


def rand_key(rng):
    return tuple(int(v) for v in rng.integers(0, 1 << 63, size=4, dtype=np.uint64))


def test_overlay_isolation_and_consolidate(rng):
    db = MemoryDB()
    h = HashDB(db)
    k = rand_key(rng)
    r = h.set("batch1", ZERO4, k, 42)
    root = r.new_root
    # backing db untouched before consolidation
    assert len(db.nodes) == 0
    assert h.get("batch1", root, k).value == 42
    h.consolidate("batch1")
    assert len(db.nodes) > 0
    # now visible without a batch overlay
    assert h.get(None, root, k).value == 42


def test_discard(rng):
    db = MemoryDB()
    h = HashDB(db)
    k = rand_key(rng)
    r = h.set("b", ZERO4, k, 7)
    h.discard("b")
    assert len(db.nodes) == 0


def test_tx_revert(rng):
    h = HashDB()
    k1, k2 = rand_key(rng), rand_key(rng)
    root = h.set("b", ZERO4, k1, 1).new_root
    h.begin_tx("b", root)
    root2 = h.set("b", root, k2, 2).new_root
    assert h.get("b", root2, k2).value == 2
    back = h.revert_tx("b")
    assert back == root
    assert h.get("b", root, k1).value == 1


def test_programs(rng):
    h = HashDB()
    k = rand_key(rng)
    h.set_program("b", k, b"\x60\x00\x60\x00")
    assert h.get_program("b", k) == b"\x60\x00\x60\x00"
    assert h.get_program(None, k) is None  # not yet consolidated
    h.consolidate("b")
    assert h.get_program(None, k) == b"\x60\x00\x60\x00"
