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


def test_is_zero_gadget():
    from xlayer_prover_tpu.recursion.circuit import Tracer
    t = Tracer()
    a, b = t.inputs(2)
    za = t.is_zero(a)
    eq = t.all_eq([a, b], [t.zero, t.constant(5)])
    t.mark_public(za)
    t.mark_public(eq)
    vals = t.run([0, 5])
    assert vals[za] == 1 and vals[eq] == 1
    vals = t.run([3, 5])
    assert vals[za] == 0 and vals[eq] == 0
    vals = t.run([0, 6])
    assert vals[eq] == 0


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
    # leaf marker + inner publics
    assert rproof.publics == [0, 0, 0, 0] + [p % P for p in proof.publics]


@pytest.mark.slow
def test_recursive2_shape_stable_aggregation(inner):
    """The A.7 pattern with an UNBALANCED tree: three batch proofs ->
    recursive1 each -> agg(agg(p1, p2), p3) through ONE shape-stable
    recursive2 engine (mixed leaf/aggregate children)."""
    from xlayer_prover_tpu.recursion.engine import build_recursion_pair
    air, setup, proof, cm1_np, publics = inner
    r1, r2 = build_recursion_pair(air, setup.verkey, n_queries=4)
    # shapes must be identical for self-verification
    from xlayer_prover_tpu.recursion.engine import _shape_sig
    assert _shape_sig(r1.air) == _shape_sig(r2.air)
    p1 = r1.prove(proof)
    p2 = r1.prove(prover.gen_proof(setup, cm1_np, publics))
    p3 = r1.prove(prover.gen_proof(setup, cm1_np, publics))
    a12 = r2.prove(p1, p2)                 # two leaves
    assert a12.publics[:4] == [v % P for v in r2.verkey]
    assert r2.verify(a12)
    a123 = r2.prove(a12, p3)               # aggregate + leaf (mixed)
    assert r2.verify(a123)
    # payload carried through (default out_map: p1's payload)
    assert a123.publics[4:] == a12.publics[4:]


def test_recursive2_link_constraints(inner):
    """The in-circuit chain rule: a link (i, j) pins payload1[i] ==
    payload2[j].  A holding link proves+verifies; a violated link breaks
    the witness (the assert gate's output wire is nonzero, so the trace
    no longer satisfies the gate AIR)."""
    import pytest as _pytest

    from xlayer_prover_tpu.recursion.engine import (Recursive2,
                                                    build_recursion_pair,
                                                    flatten_proof)
    air, setup, proof, cm1_np, publics = inner
    assert publics[0] != publics[2]
    # payload[0] == payload[0] across two identical proofs: holds
    r1, r2 = build_recursion_pair(air, setup.verkey, n_queries=4,
                                  link=[(0, 0)])
    p1 = r1.prove(proof)
    agg = r2.prove(p1, p1)
    assert r2.verify(agg)
    # a violated link (payload[0] == payload[2]) fails the assert gate at
    # witness time — the tracer refuses to execute (circuit.py:304-311)
    tracer_bad = Recursive2.trace(r1.air, r1.verkey, [(0, 2)],
                                  [("p1", i)
                                   for i in range(r1.air.n_publics - 4)])
    inputs = [int(v) % P for v in r2.setup.verkey] \
        + flatten_proof(r1.air, p1) + flatten_proof(r1.air, p1)
    with _pytest.raises(ValueError):
        tracer_bad.run(inputs)


def test_zkevm_chain_spec_shapes():
    from xlayer_prover_tpu.recursion.stack import zkevm_chain_spec
    for n in (27, 44):
        link, out_map = zkevm_chain_spec(n)
        assert link == [(19 + k, k) for k in range(8)]
        assert len(out_map) == n
        assert out_map[0] == ("p1", 0)
        assert out_map[19] == ("p2", 19)
        assert out_map[-1] == ("p2", n - 1)
