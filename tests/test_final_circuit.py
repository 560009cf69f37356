"""Final SNARK stage: the recursiveF (bn128-scheme) STARK verifier as an
R1CS circuit over BN254 Fr, its witness satisfiability, soundness
negatives, proof-independent structure, and the Groth16 wrap.
"""

import random

import pytest

from xlayer_prover_tpu.models.toy import fib
from xlayer_prover_tpu.snark import final_circuit, groth16
from xlayer_prover_tpu.snark.r1cs import check_witness
from xlayer_prover_tpu.stark import prover, verifier


@pytest.fixture(scope="module")
def inner():
    air = fib.build_air(n_bits=4, n_queries=2)
    air.scheme = "bn128"
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1_np, publics)
    assert verifier.verify(air, setup.verkey, proof)
    return air, setup, const_np, cm1_np, proof


@pytest.fixture(scope="module")
def circuit(inner):
    air, setup, _c, _cm, proof = inner
    r1cs, witness, fb = final_circuit.build_final_circuit(
        air, setup.verkey, proof)
    return r1cs, witness


def test_witness_satisfies(circuit):
    r1cs, witness = circuit
    assert r1cs.n_public == 3            # fib publics (a0, b0, result)
    assert check_witness(r1cs, witness)


def test_structure_is_proof_independent(inner, circuit):
    """A different valid proof (different trace) yields the SAME circuit
    shape — one Groth16 setup serves the stage."""
    air, setup, const_np, cm1_np, _ = inner
    import numpy as np
    cm2 = cm1_np.copy()
    # different fib seeds -> different publics/trace, same air
    const2, cm2, publics2 = fib.gen_trace(air, a0=3, b0=5)
    proof2 = prover.gen_proof(prover.Setup.build(air, const2), cm2, publics2)
    r1cs2, wit2, _ = final_circuit.build_final_circuit(
        air, prover.Setup.build(air, const2).verkey, proof2)
    r1cs, _ = circuit
    # NOTE verkey differs (different consts) — shape must still agree
    assert r1cs2.n_wires == r1cs.n_wires
    assert len(r1cs2.constraints) == len(r1cs.constraints)
    assert check_witness(r1cs2, wit2)


def test_tampered_proof_rejected(inner):
    """Corrupting a proof eval makes the circuit unsatisfiable: the
    builder's tracked values hit a failing assert."""
    air, setup, _c, _cm, proof = inner
    import copy
    bad = copy.deepcopy(proof)
    bad.evals[0][0] = (bad.evals[0][0] + 1) % prover.P
    with pytest.raises(AssertionError):
        final_circuit.build_final_circuit(air, setup.verkey, bad)


def test_tampered_public_rejected(inner):
    air, setup, _c, _cm, proof = inner
    import copy
    bad = copy.deepcopy(proof)
    bad.publics = list(bad.publics)
    bad.publics[0] = (bad.publics[0] + 1) % prover.P
    with pytest.raises(AssertionError):
        final_circuit.build_final_circuit(air, setup.verkey, bad)


@pytest.mark.slow
def test_groth16_final_roundtrip(inner):
    """The complete last hop: recursiveF proof -> R1CS witness -> Groth16
    proof -> pairing-check verification (the on-chain object)."""
    air, setup, _c, _cm, proof = inner
    rng = random.Random(7)
    r1cs, witness, _fb = final_circuit.build_final_circuit(
        air, setup.verkey, proof)
    pk, vk = groth16.setup(r1cs, rng=rng)
    g_proof = groth16.prove(pk, r1cs, witness, rng=rng)
    pubs = witness[1:1 + r1cs.n_public]
    assert groth16.verify(vk, g_proof, pubs)
    bad = list(pubs)
    bad[0] = (bad[0] + 1) % groth16.R
    assert not groth16.verify(vk, g_proof, bad)


@pytest.mark.slow
def test_cascade_finalize_groth16_wrap(inner):
    """The complete cascade: batch STARK -> recursive1 -> RecursiveF
    (bn128 STARK) -> final verifier R1CS -> Groth16 proof, pairing-check
    verified — the reference's batch -> ... -> SNARK path end-to-end
    (~15 min; the Groth16 hop runs on the native MSM)."""
    import random

    from xlayer_prover_tpu.recursion.stack import RecursionStack
    air, setup, const_np, cm1_np, _p = inner
    # a gl-scheme copy of the same air for the batch/recursion stages
    gl_air = fib.build_air(n_bits=4, n_queries=2)
    c2, cm2, p2 = fib.gen_trace(gl_air)
    s2 = prover.Setup.build(gl_air, c2)
    proof = prover.gen_proof(s2, cm2, p2)
    stack = RecursionStack(gl_air, s2.verkey, n_queries=2)
    out = stack.finalize(proof, wrap="groth16", rng=random.Random(11))
    assert out["final"] == "groth16"
    assert groth16.verify(out["vk"], out["proof"], out["publics"])
    # the inner fib publics survive to the SNARK statement
    assert out["publics"][:2] == [1, 1]
