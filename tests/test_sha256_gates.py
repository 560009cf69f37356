"""Gate-circuit SHA-256 compression vs hashlib (bit-exact)."""

import hashlib
import struct

import numpy as np

from xlayer_prover_tpu.models.zkevm import gates, sha256_gates


def test_sha256_gate_script_single_block():
    script = sha256_gates.build_script()
    assert script.n_gates > 20000

    # one-block messages: sha256(msg) where len(msg) <= 55
    msgs = [b"abc", b"", b"The quick brown fox jumps over the lazy dog"]
    batch = len(msgs)
    states = np.tile(np.array(sha256_gates.IV, dtype=np.uint32), (batch, 1))
    blocks = np.zeros((batch, 16), dtype=np.uint32)
    for i, m in enumerate(msgs):
        padded = m + b"\x80" + b"\x00" * (55 - len(m)) + \
            struct.pack(">Q", len(m) * 8)
        blocks[i] = np.frombuffer(padded, dtype=">u4").astype(np.uint32)

    packed = sha256_gates.pack_inputs(states, blocks)
    out_bits = gates.execute(script, packed)
    got = sha256_gates.unpack_outputs(np.asarray(out_bits), batch)
    for i, m in enumerate(msgs):
        exp = np.frombuffer(hashlib.sha256(m).digest(), dtype=">u4")
        assert np.array_equal(got[i], exp.astype(np.uint32)), m
