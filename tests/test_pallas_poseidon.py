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


def test_u32_pair_path_matches(rng):
    """The pure-jnp u32-pair permutation (TPU fast path candidate) is
    bit-exact vs the u64 XLA path."""
    from xlayer_prover_tpu.ops.pallas_poseidon import permute_u32
    states = rng.integers(0, gl.P, size=(64, 12), dtype=np.uint64)
    got = np.asarray(permute_u32(gl.from_u64_np(states)))
    exp = gl.to_u64_np(poseidon_gl.permute_u64(gl.from_u64_np(states)))
    assert np.array_equal(got, exp)


def test_small_mds_path_matches(rng):
    """The small-entry VPU MDS path (the TPU hot-path default) is
    bit-exact vs the u64 XLA path, incl. boundary values."""
    from xlayer_prover_tpu.ops.pallas_poseidon import permute_small
    states = rng.integers(0, gl.P, size=(64, 12), dtype=np.uint64)
    states[0] = 0
    states[1] = gl.P - 1
    states[2] = (1 << 32) - 1
    states[3] = 1 << 32
    states[4] = [gl.P - 1, 0, (1 << 32) - 1, 1 << 32, 123, gl.P - 2,
                 1, 2, 3, 4, 5, 6]
    got = np.asarray(permute_small(gl.from_u64_np(states)))
    exp = gl.to_u64_np(poseidon_gl.permute_u64(gl.from_u64_np(states)))
    assert np.array_equal(got, exp)


def test_small_lazy_and_transposed_match(rng):
    """The lazy-reduction path (the TPU hot-path default: non-canonical
    intermediates, one cond-sub at the end) and the lane-major transposed
    path are bit-exact vs the u64 XLA path, incl. boundary values."""
    from xlayer_prover_tpu.ops.pallas_poseidon import (permute_small_lazy,
                                                       permute_small_t)
    states = rng.integers(0, gl.P, size=(64, 12), dtype=np.uint64)
    states[0] = 0
    states[1] = gl.P - 1
    states[2] = (1 << 32) - 1
    states[3] = 1 << 32
    exp = gl.to_u64_np(poseidon_gl.permute_u64(gl.from_u64_np(states)))
    got = np.asarray(permute_small_lazy(gl.from_u64_np(states)))
    assert np.array_equal(got, exp)
    got_t = np.asarray(permute_small_t(gl.from_u64_np(states)))
    assert np.array_equal(got_t, exp)
    from xlayer_prover_tpu.ops.pallas_poseidon import permute_small_lazy_t
    got_lt = np.asarray(permute_small_lazy_t(gl.from_u64_np(states)))
    assert np.array_equal(got_lt, exp)


def test_mxu_mds_layer_matches(rng):
    """The MXU MDS layer (exact bf16 limb matmul + 8-bit carry composition
    + Goldilocks reduction) is bit-exact vs a host MDS oracle.

    Tested eagerly (no jit): the full permute_mxu graph triggers the known
    CPU-XLA compile blowout, so the fused path is exercised on real TPU
    only (bench.py)."""
    from xlayer_prover_tpu.ops.pallas_poseidon import _mds_mxu, _tables
    import jax.numpy as jnp
    states = rng.integers(0, gl.P, size=(16, 12), dtype=np.uint64)
    lo = jnp.asarray((states & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((states >> 32).astype(np.uint32))
    olo, ohi = _mds_mxu(lo, hi)
    got = np.asarray(olo).astype(np.uint64) \
        | (np.asarray(ohi).astype(np.uint64) << 64 - 32)
    _c, m, _f, _o = _tables()
    P = gl.P
    exp = np.zeros_like(states)
    for r in range(states.shape[0]):
        for j in range(12):
            exp[r, j] = sum(int(states[r, i]) * int(m[i][j])
                            for i in range(12)) % P
    assert np.array_equal(got, exp)
