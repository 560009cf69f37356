"""Erigon witness decoder on the real blueberry testvectors + key derivation."""

import json
import os

import pytest

from xlayer_prover_tpu.state import keys
from xlayer_prover_tpu.state.database import MemoryDB
from xlayer_prover_tpu.state.smt import Smt, ZERO4
from xlayer_prover_tpu.state.witness import witness2db

VECTOR = "/root/reference/testvectors/erigonWitness/blueberry_block_1.json"


def test_key_derivation_distinct():
    addr = 0xDEAD72FD97A579E98AEF2F9EB190066E1858D15A
    ks = [keys.balance_key(addr), keys.nonce_key(addr), keys.code_key(addr),
          keys.storage_key(addr, 1), keys.storage_key(addr, 2),
          keys.code_length_key(addr)]
    assert len(set(ks)) == len(ks)
    # deterministic
    assert keys.balance_key(addr) == keys.balance_key(addr)


@pytest.mark.skipif(not os.path.exists(VECTOR), reason="testvector absent")
def test_parse_blueberry_witness():
    blob = bytes.fromhex(
        json.load(open(VECTOR))["result"].removeprefix("0x"))
    res = witness2db(blob)
    # the full blob must be consumed and yield a populated node map
    assert len(res.db) > 10
    assert res.state_root != 0
    # deterministic
    res2 = witness2db(blob)
    assert res2.state_root == res.state_root
    assert len(res2.db) == len(res.db)


@pytest.mark.skipif(not os.path.exists(VECTOR), reason="testvector absent")
def test_witness_db_feeds_smt_get():
    """SMT reads walk the witness-built node map (stateless proving)."""
    blob = bytes.fromhex(
        json.load(open(VECTOR))["result"].removeprefix("0x"))
    res = witness2db(blob)
    db = MemoryDB()
    for k, v in res.db.items():
        db.write(k, v)
    smt = Smt(db)
    # walking from the root must succeed for at least the leaves present
    # (a get of a random key may hit an opaque HASH boundary; the root node
    # itself must be resolvable)
    root_node = db.read(res.root4)
    assert root_node is not None and len(root_node) == 12


def test_witness_rejects_garbage():
    from xlayer_prover_tpu.utils.zkresult import ZkError
    with pytest.raises(ZkError):
        witness2db(b"")
    with pytest.raises(ZkError):
        witness2db(b"\x02\x01")   # wrong header version
    with pytest.raises(ZkError):
        witness2db(b"\x01\xff")   # unsupported opcode
