"""End-to-end: prove + verify toy circuits; tampering must fail."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.toy import fib
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.stark.proof import StarkProof


@pytest.fixture(scope="module")
def fib_setup():
    air = fib.build_air(n_bits=5, n_queries=8)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    return air, setup, cm1_np, publics


def test_prove_and_verify(fib_setup):
    air, setup, cm1_np, publics = fib_setup
    proof = prover.gen_proof(setup, cm1_np, publics)
    assert verifier.verify(air, setup.verkey, proof)


def test_proof_json_roundtrip(fib_setup):
    air, setup, cm1_np, publics = fib_setup
    proof = prover.gen_proof(setup, cm1_np, publics)
    j = proof.to_json()
    proof2 = StarkProof.from_json(j)
    assert verifier.verify(air, setup.verkey, proof2)


def test_wrong_public_fails(fib_setup):
    air, setup, cm1_np, publics = fib_setup
    bad = list(publics)
    bad[2] = (bad[2] + 1) % fib.P
    proof = prover.gen_proof(setup, cm1_np, bad)
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)


def test_tampered_trace_fails(fib_setup):
    air, setup, cm1_np, publics = fib_setup
    bad = cm1_np.copy()
    bad[3, 1] = (bad[3, 1] + 1) % fib.P  # break fibonacci transition
    proof = prover.gen_proof(setup, bad, publics)
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)


def test_tampered_proof_fails(fib_setup):
    air, setup, cm1_np, publics = fib_setup
    proof = prover.gen_proof(setup, cm1_np, publics)
    proof.evals[0][0] = (proof.evals[0][0] + 1) % fib.P
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)


def test_fib_no_arguments():
    air = fib.build_air(n_bits=4, n_queries=4, with_lookup=False,
                        with_permutation=False)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1_np, publics)
    assert verifier.verify(air, setup.verkey, proof)


def test_proof_to_zkin_and_join(fib_setup):
    """zkin export (proof2zkinStark/joinzkin naming) round-trips the
    proof content into circom input-signal form."""
    from xlayer_prover_tpu.stark.zkin import joinzkin, proof_to_zkin
    air, setup, cm1_np, publics = fib_setup
    proof = prover.gen_proof(setup, cm1_np, publics)
    zkin = proof_to_zkin(air, proof)
    assert zkin["root1"] == [str(v) for v in proof.roots[0]]
    assert len(zkin["evals"]) == len(proof.evals)
    assert len(zkin["s0_vals1"]) == air.n_queries
    n_steps = len(proof.fri_steps)
    for i in range(1, n_steps):
        assert f"s{i}_root" in zkin and f"s{i}_vals" in zkin
    assert len(zkin["finalPol"]) == len(proof.final_pol)
    joined = joinzkin(zkin, zkin, setup.verkey, n_steps)
    assert joined["a_root1"] == joined["b_root1"] == zkin["root1"]
    assert joined["publics"] == zkin["publics"] * 2
    assert joined["rootC"] == [str(v) for v in setup.verkey]
