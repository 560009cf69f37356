"""Versioned KeyValueTree over the paged backend (reference hashdb64
key_value_tree.hpp + root-version pages): COW version history, leaf
splits at the 64-ary fan-out, directory persistence across reopen.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.state.kv_tree import LEAF_CAP, KeyValueTree
from xlayer_prover_tpu.state.page_manager import PageManager


def test_basic_write_read():
    t = KeyValueTree()
    t.write(1, 0xDEAD, 111)
    t.write(1, 0xBEEF, 222)
    assert t.read(1, 0xDEAD) == 111
    assert t.read(1, 0xBEEF) == 222
    assert t.read(1, 0x1234) is None


def test_version_history_cow():
    t = KeyValueTree()
    t.write(1, 5, 100)
    t.write(2, 5, 200)       # new generation overwrites
    t.write(2, 6, 60)
    assert t.read(1, 5) == 100     # the old version is intact
    assert t.read(1, 6) is None
    assert t.read(2, 5) == 200
    assert t.read(2, 6) == 60
    # reads at a later version see the latest published root
    assert t.read(9, 5) == 200


def test_leaf_split_many_keys(rng):
    t = KeyValueTree()
    keys = [int(k) for k in
            rng.integers(0, 1 << 63, size=3 * LEAF_CAP, dtype=np.int64)]
    for i, k in enumerate(keys):
        t.write(1, k << 128, i)       # high bits: exercises nibble paths
    for i, k in enumerate(keys):
        assert t.read(1, k << 128) == i


def test_directory_persistence(tmp_path):
    path = str(tmp_path / "kv.pages")
    t = KeyValueTree(PageManager(path))
    t.write(3, 42, 4242)
    t.write(3, 43, 4343)
    t.flush()
    t2 = KeyValueTree(PageManager(path))
    assert t2.latest_version == 3
    assert t2.read(3, 42) == 4242
    assert t2.read(3, 43) == 4343
