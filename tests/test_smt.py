"""SMT: reference-semantics sparse Merkle tree tests."""

import numpy as np
import pytest

from xlayer_prover_tpu.state.database import MemoryDB
from xlayer_prover_tpu.state.smt import (Smt, ZERO4, join_key, remove_key_bits,
                                         split_key)


def rand_key(rng):
    return tuple(int(v) for v in rng.integers(0, 1 << 63, size=4, dtype=np.uint64))


def test_key_split_join_roundtrip(rng):
    for _ in range(20):
        k = rand_key(rng)
        bits = split_key(k)
        assert len(bits) == 256
        for n in [0, 1, 5, 64, 255]:
            rk = remove_key_bits(k, n)
            assert join_key(bits[:n], rk) == k


def test_insert_get_update_delete(rng):
    smt = Smt(MemoryDB())
    root = ZERO4
    k1, k2 = rand_key(rng), rand_key(rng)
    r = smt.set(root, k1, 100)
    assert r.mode == "insertNotFound"
    root = r.new_root
    assert smt.get(root, k1).value == 100
    assert not smt.get(root, k2).found

    r = smt.set(root, k2, 200)
    assert r.mode == "insertFound"
    root = r.new_root
    assert smt.get(root, k1).value == 100
    assert smt.get(root, k2).value == 200

    r = smt.set(root, k1, 111)
    assert r.mode == "update"
    assert r.old_value == 100
    root = r.new_root
    assert smt.get(root, k1).value == 111

    r = smt.set(root, k1, 0)   # delete -> k2 collapses to a lone leaf
    root = r.new_root
    assert not smt.get(root, k1).found
    assert smt.get(root, k2).value == 200

    r = smt.set(root, k2, 0)   # delete last -> empty tree
    assert r.new_root == ZERO4


def test_root_is_canonical_under_op_order(rng):
    """Same final key-value set => same root, regardless of history."""
    kvs = [(rand_key(rng), int(v))
           for v in rng.integers(1, 1 << 40, size=12)]

    smt1 = Smt(MemoryDB())
    root1 = ZERO4
    for k, v in kvs:
        root1 = smt1.set(root1, k, v).new_root

    smt2 = Smt(MemoryDB())
    root2 = ZERO4
    extra = [(rand_key(rng), int(v)) for v in rng.integers(1, 1 << 40, size=6)]
    for k, v in reversed(kvs):
        root2 = smt2.set(root2, k, v).new_root
    for k, v in extra:
        root2 = smt2.set(root2, k, v).new_root
    for k, _ in extra:
        root2 = smt2.set(root2, k, 0).new_root

    assert root1 == root2


def test_many_random_ops_vs_model(rng):
    smt = Smt(MemoryDB())
    root = ZERO4
    model = {}
    keys = [rand_key(rng) for _ in range(24)]
    for step in range(300):
        k = keys[rng.integers(0, len(keys))]
        if rng.random() < 0.3:
            v = 0
        else:
            v = int(rng.integers(1, 1 << 60))
        root = smt.set(root, k, v).new_root
        if v == 0:
            model.pop(k, None)
        else:
            model[k] = v
        if step % 50 == 0:
            for kk in keys:
                got = smt.get(root, kk)
                assert got.value == model.get(kk, 0), (step, kk)
    for kk in keys:
        assert smt.get(root, kk).value == model.get(kk, 0)


def test_zero_to_zero(rng):
    smt = Smt(MemoryDB())
    k1, k2 = rand_key(rng), rand_key(rng)
    root = smt.set(ZERO4, k1, 5).new_root
    r = smt.set(root, k2, 0)
    assert r.mode == "zeroToZero"
    assert r.new_root == root
