"""Sharded pipeline on the 8-device virtual CPU mesh."""

import numpy as np

from xlayer_prover_tpu.fields import gl
from xlayer_prover_tpu.ops import ntt
from xlayer_prover_tpu.parallel import pipeline


def test_sharded_lde_matches_single_device(rng):
    n_bits, n_bits_ext, n_cols = 7, 8, 8
    mesh = pipeline.make_mesh(8)
    vals = rng.integers(0, gl.P, size=(1 << n_bits, n_cols), dtype=np.uint64)
    pair = gl.from_u64_np(vals)
    with mesh:
        sharded = pipeline.lde_sharded(pair, n_bits_ext, mesh)
        got = gl.to_u64_np(sharded)
    exp = gl.to_u64_np(ntt.extend_pol(pair, n_bits_ext))
    assert np.array_equal(got, exp)


def test_prove_core_step_runs_on_mesh(rng):
    import jax
    n_bits, n_bits_ext, n_cols = 5, 6, 8
    mesh = pipeline.make_mesh(8)
    step = pipeline.build_prove_core_step(n_bits, n_bits_ext, n_cols, mesh)
    vals = rng.integers(0, gl.P, size=(1 << n_bits, n_cols), dtype=np.uint64)
    pair = gl.from_u64_np(vals)
    ch = gl.from_u64_np(np.array([1, 2, 3], dtype=np.uint64))
    with mesh:
        root, q = step(pair, ch)
        jax.block_until_ready((root, q))
    # root must match the unsharded merkle of the unsharded LDE
    from xlayer_prover_tpu.ops import merkle
    ext = ntt.extend_pol(pair, n_bits_ext)
    tree = merkle.merkelize(ext, n_cols)
    assert np.array_equal(gl.to_u64_np(root), tree.root_np())


def test_graft_entry_single_chip():
    import jax
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_entry_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
