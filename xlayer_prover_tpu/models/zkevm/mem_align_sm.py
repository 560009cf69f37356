"""MemAlign SM: unaligned 256-bit read/write across 32-byte words.

Equivalent of the reference MemAlign SM (src/sm/mem_align/
mem_align_executor.cpp): the EVM reads/writes 32-byte values at arbitrary
byte offsets, spanning two aligned machine words (m0, m1).  The expander
turns each action into the byte-level trace the circuit consumes: per
action, 32 rows selecting bytes from (m0 || m1) at offset..offset+31 (RD),
or merging the value into the pair (WR/WR8).

Round-1 scope: the trace expander + host semantics oracle (the AIR follows
the Binary SM pattern: per-byte plookups + factor recomposition).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

M256 = (1 << 256) - 1


@dataclasses.dataclass
class MemAlignAction:
    op: str       # "RD" | "WR" | "WR8"
    m0: int       # aligned word at addr
    m1: int       # aligned word at addr+32
    offset: int   # byte offset 0..31
    value: int    # RD: result; WR: 256-bit value; WR8: single byte


def apply_action(a: MemAlignAction) -> Tuple[int, int, int]:
    """Host oracle: returns (result_value, new_m0, new_m1)."""
    assert 0 <= a.offset < 32
    pair = (a.m0 << 256) | a.m1          # 64 bytes, big-endian semantics
    if a.op == "RD":
        shift = 8 * (32 - a.offset)
        val = (pair >> shift) & M256
        return val, a.m0, a.m1
    if a.op == "WR":
        shift = 8 * (32 - a.offset)
        mask = M256 << shift
        pair = (pair & ~mask) | ((a.value & M256) << shift)
        return a.value & M256, (pair >> 256) & M256, pair & M256
    if a.op == "WR8":
        byte_pos = 63 - a.offset          # byte index from LSB side
        shift = 8 * byte_pos
        pair = (pair & ~(0xFF << shift)) | ((a.value & 0xFF) << shift)
        return a.value & 0xFF, (pair >> 256) & M256, pair & M256
    raise ValueError(a.op)


def expand_trace(actions: List[MemAlignAction]):
    """Returns per-action 32-row byte traces:
    rows[k] = (sel_byte_index, src_byte, out_byte) — the circuit's byte
    stream (selection plookup binds sel->byte of the m0m1 pair)."""
    out = []
    for a in actions:
        val, new_m0, new_m1 = apply_action(a)
        pair_bytes = ((a.m0 << 256) | a.m1).to_bytes(64, "big")
        rows = []
        if a.op == "RD":
            for i in range(32):
                rows.append((a.offset + i, pair_bytes[a.offset + i],
                             (val >> (8 * (31 - i))) & 0xFF))
        else:
            new_pair_bytes = ((new_m0 << 256) | new_m1).to_bytes(64, "big")
            for i in range(32):
                rows.append((a.offset + i, pair_bytes[a.offset + i],
                             new_pair_bytes[a.offset + i]))
        out.append((a, val, new_m0, new_m1, rows))
    return out
