"""Recursion: the STARK verifier as a circuit, proven by the gate AIR.

Witness generation re-executes every assertion gate, so `Tracer.run` on a
flattened proof IS an independent re-verification — the fast tests cover
that; the slow tests run the full recursive proof + aggregation."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.toy import fib
from xlayer_prover_tpu.recursion.engine import Recursive1, Recursive2
from xlayer_prover_tpu.recursion.verifier_circuit import (
    build_verifier_circuit, flatten_proof)
from xlayer_prover_tpu.stark import prover, verifier

P = prover.P


@pytest.fixture(scope="module")
def inner():
    air = fib.build_air(n_bits=4, n_queries=2)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1_np, publics)
    assert verifier.verify(air, setup.verkey, proof)
    return air, setup, proof, cm1_np, publics


def test_verifier_circuit_witness(inner):
    air, setup, proof, _cm1, _pub = inner
    tracer, pw = build_verifier_circuit(air, setup.verkey)
    stats = tracer.stats()
    assert stats["poseidons"] > 10 and stats["gates"] > 100
    vals = tracer.run(flatten_proof(air, proof))
    # circuit publics = inner publics
    assert [vals[w] for w in tracer.public_wires] == \
        [p % P for p in proof.publics]


def test_verifier_circuit_rejects_tampered(inner):
    air, setup, proof, _cm1, _pub = inner
    tracer, pw = build_verifier_circuit(air, setup.verkey)
    flat = flatten_proof(air, proof)
    bad = list(flat)
    bad[len(proof.publics) + 2] += 1      # tamper a root limb
    with pytest.raises(ValueError):
        tracer.run(bad)


@pytest.fixture(scope="module")
def rec1(inner):
    air, setup, proof, _cm1, _pub = inner
    return Recursive1(air, setup.verkey, n_queries=4)


@pytest.mark.slow
def test_recursive1_proof(inner, rec1):
    air, setup, proof, _cm1, _pub = inner
    rproof = rec1.prove(proof)
    assert rec1.verify(rproof)
    assert rproof.publics == [p % P for p in proof.publics]


@pytest.mark.slow
def test_recursive2_aggregation(inner, rec1):
    """The A.7 pattern in miniature: two batch proofs -> recursive1 each ->
    one recursive2 aggregate that the native verifier accepts."""
    air, setup, proof, cm1_np, publics = inner
    p1 = rec1.prove(proof)
    proof_b = prover.gen_proof(setup, cm1_np, publics)
    p2 = rec1.prove(proof_b)
    agg = Recursive2(rec1.air, rec1.verkey, n_queries=4)
    aproof = agg.prove(p1, p2)
    assert agg.verify(aproof)
    assert aproof.publics == p1.publics + p2.publics
