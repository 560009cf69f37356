"""Pallas Poseidon kernel (interpret mode on CPU) vs XLA and host oracles.

One test, one interpret-mode call (interpretation of the fused 30-round
kernel costs ~a minute): batch 128 over tile 64 exercises the multi-tile
grid AND bit-exactness against both the XLA scan path and the host oracle.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.fields import gl
from xlayer_prover_tpu.ops import pallas_poseidon, poseidon_gl
from xlayer_prover_tpu.ops.merkle import _host_permute


@pytest.mark.slow
def test_pallas_permute_matches(rng):
    batch = 128
    states = rng.integers(0, gl.P, size=(batch, 12), dtype=np.uint64)
    got = np.asarray(pallas_poseidon.permute(gl.from_u64_np(states), True, 64))
    exp_xla = gl.to_u64_np(poseidon_gl.permute(gl.from_u64_np(states)))
    assert np.array_equal(got, exp_xla)
    for i in [0, 17, 77, batch - 1]:
        exp = _host_permute([int(v) for v in states[i]])
        assert [int(v) for v in got[i]] == exp, i
