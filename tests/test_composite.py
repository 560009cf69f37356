"""Composite circuit: Main dispatch + Binary SM + Memory SM in one AIR."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import composite
from xlayer_prover_tpu.stark import prover, verifier


@pytest.fixture(scope="module")
def comp():
    air, layout = composite.build(n_bits=11, chunk_bits=2, n_queries=4)
    return air, layout


def _mem_actions():
    return [("W", 3, 10, 0), ("R", 3, 10, 1), ("W", 8, 5, 2), ("R", 8, 5, 4)]


def test_composite_proves_and_verifies(comp, rng):
    air, layout = comp
    a = int(rng.integers(0, 1 << 60))
    b = int(rng.integers(0, 1 << 60))
    bin_actions = [("ADD", a, b), ("XOR", a, b)]
    const_np, cm1, results = composite.gen_trace(air, layout, bin_actions,
                                                 _mem_actions())
    assert results[0][0] == a + b
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1, [])
    assert verifier.verify(air, setup.verkey, proof)


def test_composite_rejects_false_claim(comp, rng):
    """A main row claiming a result the Binary SM never computed fails."""
    air, layout = comp
    a, b = 1234567890123456789, 987654321
    const_np, cm1, _ = composite.gen_trace(air, layout, [("ADD", a, b)],
                                           _mem_actions())
    # corrupt the claimed result limb 0
    cm1[0, layout.main["c0"].index] ^= 1
    with pytest.raises(Exception):
        setup = prover.Setup.build(air, const_np)
        proof = prover.gen_proof(setup, cm1, [])
        verifier.verify(air, setup.verkey, proof)
