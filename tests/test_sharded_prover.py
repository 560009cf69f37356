"""Sharded gen_proof: proof bytes identical to the single-device run."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.toy import fib
from xlayer_prover_tpu.parallel import pipeline
from xlayer_prover_tpu.stark import prover, verifier


@pytest.mark.slow
def test_sharded_proof_matches_unsharded():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh (conftest sets 8 CPU devices)")
    air = fib.build_air(n_bits=6, n_queries=4)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    base = prover.gen_proof(setup, cm1_np, publics)
    mesh = pipeline.make_mesh(len(jax.devices()))  # subset meshes deadlock on this jax
    sharded = prover.gen_proof(setup, cm1_np, publics, mesh=mesh)
    assert verifier.verify(air, setup.verkey, sharded)
    assert sharded.to_json() == base.to_json()
