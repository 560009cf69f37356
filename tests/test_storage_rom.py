"""Storage micro-ROM loader (real artifact) + climb-key semantics."""

import os

import numpy as np
import pytest

from xlayer_prover_tpu.executor.storage_rom import (StorageRom, climb_key,
                                                    descend_key)
from xlayer_prover_tpu.state.smt import (join_key, remove_key_bits, split_key)

ROM = "/root/reference/config/scripts/storage_sm_rom.json"


@pytest.mark.skipif(not os.path.exists(ROM), reason="storage ROM absent")
def test_load_real_storage_rom():
    rom = StorageRom.load(ROM)
    assert len(rom) == 286
    ops = {"hash": 0, "climb": 0, "latch": 0, "jumps": 0}
    for l in rom.lines:
        ops["hash"] += l.hash
        ops["climb"] += l.climb_rkey or l.climb_sibling_rkey
        ops["latch"] += l.latch_get or l.latch_set
        ops["jumps"] += (l.jmp is not None) + (l.jmpz is not None) + \
            (l.jmpnz is not None)
    assert ops["hash"] == 59
    assert ops["latch"] == 7
    assert ops["climb"] == 31  # climbRkey+climbSiblingRkey co-occur per line
    # jump targets in range
    for l in rom.lines:
        for t in (l.jmp, l.jmpz, l.jmpnz):
            if t is not None:
                assert 0 <= t < len(rom)


def test_climb_descend_roundtrip(rng):
    rkey = tuple(int(v) for v in rng.integers(0, 1 << 60, size=4,
                                              dtype=np.uint64))
    for level in [255, 254, 100, 4, 1, 0]:
        for bit in (0, 1):
            climbed = climb_key(rkey, level, bit)
            back, got_bit = descend_key(climbed, level)
            assert back == rkey and got_bit == bit, (level, bit)


def test_climb_matches_smt_key_bits(rng):
    """Climbing from remove_key_bits(key, L) with the path bit at L-1 must
    equal remove_key_bits(key, L-1)."""
    key = tuple(int(v) for v in rng.integers(0, 1 << 62, size=4,
                                             dtype=np.uint64))
    bits = split_key(key)
    for level in [256, 200, 64, 7, 1]:
        rk = remove_key_bits(key, level)
        climbed = climb_key(rk, level - 1, bits[level - 1])
        assert climbed == remove_key_bits(key, level - 1), level
