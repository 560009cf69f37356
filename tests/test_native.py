"""Native crypto library vs python-exact implementations."""

import numpy as np
import pytest

from xlayer_prover_tpu import native
from xlayer_prover_tpu.fields import gl
from xlayer_prover_tpu.ops.keccak import keccak256 as py_keccak256
from xlayer_prover_tpu.ops.merkle import _host_permute


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="libzkcrypto.so not built")


@requires_native
def test_native_keccak256_matches_python(rng):
    for n in [0, 1, 31, 32, 135, 136, 137, 400]:
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        assert native.keccak256(data) == py_keccak256(data), n


@requires_native
def test_native_poseidon_matches_python(rng):
    for _ in range(5):
        state = [int(v) for v in rng.integers(0, gl.P, size=12,
                                              dtype=np.uint64)]
        assert native.poseidon_permute(state) == _host_permute(state)


@requires_native
def test_native_poseidon_batch(rng):
    states = rng.integers(0, gl.P, size=(8, 12), dtype=np.uint64)
    got = native.poseidon_permute_batch(states)
    for i in range(8):
        exp = _host_permute([int(v) for v in states[i]])
        assert [int(v) for v in got[i]] == exp


@requires_native
def test_native_speedup_sanity(rng):
    """Native poseidon should beat pure python comfortably."""
    import time
    states = rng.integers(0, gl.P, size=(200, 12), dtype=np.uint64)
    t0 = time.perf_counter()
    native.poseidon_permute_batch(states)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(20):
        _host_permute([int(v) for v in states[i]])
    t_py = (time.perf_counter() - t0) * 10  # scaled to 200
    assert t_native < t_py
