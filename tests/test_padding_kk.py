"""PaddingKK chain: padded sponge blocks through the gate SM == keccak256."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import padding_kk
from xlayer_prover_tpu.ops.keccak import keccak256


def test_pad_stream_shapes():
    assert len(padding_kk.pad_stream(b"")[0]) == 136
    assert len(padding_kk.pad_stream(b"x" * 135)) == 1
    assert len(padding_kk.pad_stream(b"x" * 136)) == 2
    # pad_len == 1 single-byte 0x81 case
    blocks = padding_kk.pad_stream(b"y" * 135)
    assert blocks[0][-1] == 0x81


@pytest.mark.slow
def test_chain_through_gate_sm(rng):
    streams = [b"", b"abc",
               bytes(rng.integers(0, 256, 200, dtype=np.uint8))]  # 2 blocks
    padded, states = padding_kk.expand(streams)
    assert states.shape[0] == 1 + 1 + 2
    outputs = padding_kk.run_instances(states)
    digests = padding_kk.digests_from_outputs(padded, outputs)
    for data, got, ps in zip(streams, digests, padded):
        assert got == keccak256(data), data[:8]
        assert ps.digest == got   # host chain agrees with gate SM
