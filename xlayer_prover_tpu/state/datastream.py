"""Sequencer datastream decoder (stateless proving input).

Equivalent of the reference dataStream2batch (src/prover/data_stream.cpp):
the stream is a sequence of FileEntry packets
  u8 packetType (2 = data, 0 = padding) | u32 length | u32 entryType |
  u64 number | u8[length-17] data
with entry types 0xb0 bookmark (skipped), 1 start-L2-block (batchNum,
blockNum, timestamp, deltaTimestamp, l1InfoTreeIndex, l1BlockHash,
globalExitRoot, coinbase, forkId, chainId — 122 bytes), 2 L2-tx
(gasPricePercentage, isValid, stateRoot, length-prefixed RLP tx) and
3 end-L2-block (blockNum, l2BlockHash, stateRoot — 72 bytes).
The result feeds batchL2Data re-encoding for stateless batch proving.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional

from ..utils.zkresult import ZkError, ZkResult


@dataclasses.dataclass
class DataStreamTx:
    gas_price_percentage: int
    is_valid: int
    state_root: bytes
    encoded_tx: bytes


@dataclasses.dataclass
class DataStreamBlock:
    block_number: int
    timestamp: int
    delta_timestamp: int
    l1_info_tree_index: int
    l1_block_hash: bytes
    global_exit_root: bytes
    coinbase: bytes
    txs: List[DataStreamTx] = dataclasses.field(default_factory=list)
    l2_block_hash: bytes = b""
    state_root: bytes = b""


@dataclasses.dataclass
class DataStreamBatch:
    batch_number: int = 0
    fork_id: int = 0
    chain_id: int = 0
    blocks: List[DataStreamBlock] = dataclasses.field(default_factory=list)

    def total_txs(self):
        return sum(len(b.txs) for b in self.blocks)


def _err(msg):
    raise ZkError(ZkResult.INVALID_INPUT, f"datastream: {msg}")


def datastream2batch(data: bytes) -> DataStreamBatch:
    batch = DataStreamBatch()
    p = 0
    n = len(data)
    while p < n:
        packet_type = data[p]
        p += 1
        if p + 4 > n:
            _err("truncated length")
        (length,) = struct.unpack_from(">I", data, p)
        p += 4
        if length < 17:
            _err(f"length {length} < 17")
        if p + 4 > n:
            _err("truncated entry type")
        (entry_type,) = struct.unpack_from(">I", data, p)
        p += 4
        if p + 8 > n:
            _err("truncated entry number")
        p += 8  # entry number (sequential, unused here)
        data_len = length - 17
        if p + data_len > n:
            _err("truncated entry data")
        body = data[p:p + data_len]
        p += data_len

        if packet_type == 0:
            continue
        if packet_type != 2:
            _err(f"unsupported packet type {packet_type}")
        if entry_type == 0xB0:      # bookmark
            continue
        if entry_type == 1:         # start L2 block
            if data_len != 122:
                _err(f"start-block data length {data_len} != 122")
            (batch_num, block_num, timestamp) = struct.unpack_from(
                ">QQQ", body, 0)
            (delta_ts, l1_index) = struct.unpack_from(">II", body, 24)
            l1_block_hash = body[32:64]
            ger = body[64:96]
            coinbase = body[96:116]
            (fork_id,) = struct.unpack_from(">H", body, 116)
            (chain_id,) = struct.unpack_from(">I", body, 118)
            if batch_num == 0:
                _err("batchNumber == 0")
            if batch.batch_number == 0:
                batch.batch_number = batch_num
                batch.fork_id = fork_id
                batch.chain_id = chain_id
            else:
                if batch_num != batch.batch_number:
                    _err("batch number mismatch")
                if fork_id != batch.fork_id:
                    _err("fork id mismatch")
                if chain_id != batch.chain_id:
                    _err("chain id mismatch")
            if batch.blocks and not batch.blocks[-1].l2_block_hash:
                _err("start block while previous block open")
            batch.blocks.append(DataStreamBlock(
                block_number=block_num, timestamp=timestamp,
                delta_timestamp=delta_ts, l1_info_tree_index=l1_index,
                l1_block_hash=l1_block_hash, global_exit_root=ger,
                coinbase=coinbase))
            continue
        if entry_type == 2:         # L2 tx
            if data_len < 38:
                _err("tx entry too short")
            if not batch.blocks or batch.blocks[-1].l2_block_hash:
                _err("tx outside an open block")
            gas_pct = body[0]
            is_valid = body[1]
            state_root = body[2:34]
            (tx_len,) = struct.unpack_from(">I", body, 34)
            if 38 + tx_len > data_len:
                _err("tx encoded length overruns entry")
            batch.blocks[-1].txs.append(DataStreamTx(
                gas_price_percentage=gas_pct, is_valid=is_valid,
                state_root=state_root, encoded_tx=body[38:38 + tx_len]))
            continue
        if entry_type == 3:         # end L2 block
            if data_len != 72:
                _err(f"end-block data length {data_len} != 72")
            (block_num,) = struct.unpack_from(">Q", body, 0)
            if not batch.blocks:
                _err("end block without start")
            blk = batch.blocks[-1]
            if blk.l2_block_hash:
                _err("block already closed")
            if block_num != blk.block_number:
                _err("end-block number mismatch")
            blk.l2_block_hash = body[8:40]
            blk.state_root = body[40:72]
            continue
        # unknown data entry types are tolerated (forward compat), like the
        # reference's default branch logging-and-continuing
    return batch
