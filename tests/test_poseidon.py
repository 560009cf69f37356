"""Poseidon permutation / linear hash / Merkle tree vs host-exact oracle."""

import numpy as np

from xlayer_prover_tpu.fields import gl
from xlayer_prover_tpu.ops import merkle, poseidon_gl

P = gl.P


def test_permute_vs_host(rng):
    batch = 16
    vals = rng.integers(0, P, size=(batch, 12), dtype=np.uint64)
    state = gl.from_u64_np(vals)
    got = gl.to_u64_np(poseidon_gl.permute(state))
    for b in range(0, batch, 5):
        exp = merkle._host_permute([int(v) for v in vals[b]])
        assert [int(v) for v in got[b]] == exp, b


def test_permute_diffusion(rng):
    # single-bit input change flips the whole digest (sanity of parameters)
    v = rng.integers(0, P, size=(1, 12), dtype=np.uint64)
    w = v.copy()
    w[0, 3] ^= np.uint64(1)
    a = gl.to_u64_np(poseidon_gl.permute(gl.from_u64_np(v)))
    b = gl.to_u64_np(poseidon_gl.permute(gl.from_u64_np(w)))
    assert not np.array_equal(a[:, :4], b[:, :4])


def test_linear_hash_widths(rng):
    for width in [2, 4, 5, 8, 9, 16, 23]:
        rows = rng.integers(0, P, size=(6, width), dtype=np.uint64)
        got = gl.to_u64_np(poseidon_gl.linear_hash(gl.from_u64_np(rows), width))
        for b in [0, 5]:
            exp = merkle._host_linear_hash([int(v) for v in rows[b]])
            assert [int(v) for v in got[b]] == exp, (width, b)


def test_merkle_tree_and_proofs(rng):
    height, width = 32, 9
    rows = rng.integers(0, P, size=(height, width), dtype=np.uint64)
    tree = merkle.merkelize(gl.from_u64_np(rows), width)
    root = tree.root_np()
    assert len(tree.levels) == 6  # 32,16,8,4,2,1
    for idx in [0, 1, 17, 31]:
        path = merkle.get_proof(tree, idx)
        assert merkle.verify_proof(root, idx, rows[idx], path)
    # tampered leaf fails
    bad = rows[3].copy()
    bad[0] ^= np.uint64(1)
    path = merkle.get_proof(tree, 3)
    assert not merkle.verify_proof(root, 3, bad, path)
