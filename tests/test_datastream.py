"""Datastream decoder on the real stateless testvector blob."""

import json
import os
import struct

import pytest

from xlayer_prover_tpu.state.datastream import datastream2batch
from xlayer_prover_tpu.utils.zkresult import ZkError

VEC = "/root/reference/testvectors/stateless/input_executor_0.json"


@pytest.mark.skipif(not os.path.exists(VEC), reason="testvector absent")
def test_parse_real_datastream():
    blob = bytes.fromhex(json.load(open(VEC))["dataStream"]
                         .removeprefix("0x"))
    batch = datastream2batch(blob)
    assert batch.batch_number > 0
    assert batch.fork_id > 0
    assert batch.chain_id > 0
    assert len(batch.blocks) >= 1
    # every block closed with hashes/roots
    for blk in batch.blocks:
        assert len(blk.l2_block_hash) == 32
        assert len(blk.state_root) == 32
        assert len(blk.coinbase) == 20
    # transactions decoded with RLP payloads
    assert batch.total_txs() >= 1
    for blk in batch.blocks:
        for tx in blk.txs:
            assert len(tx.encoded_tx) > 0
    # deterministic
    b2 = datastream2batch(blob)
    assert b2.batch_number == batch.batch_number
    assert b2.total_txs() == batch.total_txs()


def test_garbage_rejected():
    with pytest.raises(ZkError):
        datastream2batch(b"\x02\x00\x00\x00\x05")   # length < 17
    # padding-only stream parses to an empty batch
    pad = b"\x00" + struct.pack(">I", 17) + struct.pack(">I", 0) + b"\x00" * 8
    batch = datastream2batch(pad)
    assert batch.batch_number == 0 and not batch.blocks


@pytest.mark.skipif(not os.path.exists(VEC), reason="testvector absent")
def test_batch_l2_data_reencoding():
    """dataStreamBatch2batchL2Data equivalent: block markers + transcoded
    txs (data_stream.cpp:515-556)."""
    import json
    from xlayer_prover_tpu.state.datastream import (batch_to_l2_data,
                                                    datastream2batch)
    d = json.load(open(VEC))
    batch = datastream2batch(bytes.fromhex(d["dataStream"].removeprefix("0x")))
    l2 = batch_to_l2_data(batch)
    # one 0x0b change-block marker per block, at the right positions
    assert l2[0] == 0x0B
    pos = 0
    markers = 0
    for blk in batch.blocks:
        assert l2[pos] == 0x0B
        markers += 1
        pos += 9                      # marker + deltaTs(4) + l1InfoIndex(4)
        for tx in blk.txs:
            from xlayer_prover_tpu.state.datastream import transcode_tx
            enc = transcode_tx(tx.encoded_tx, batch.chain_id)
            assert l2[pos:pos + len(enc)] == enc
            pos += len(enc) + 1       # + effectivePercentage byte
    assert markers == len(batch.blocks)
    assert pos == len(l2)
