"""Groth16 end-to-end: setup -> prove -> pairing-check verify."""

import random

import pytest

from xlayer_prover_tpu.fields.bn254 import R
from xlayer_prover_tpu.snark import groth16
from xlayer_prover_tpu.snark.r1cs import R1CSBuilder, check_witness


def cubic_circuit(x: int):
    """Prove knowledge of x with x^3 + x + 5 == out (a classic)."""
    b = R1CSBuilder()
    out = b.public((x ** 3 + x + 5) % R)
    xw = b.wire(x)
    x2 = b.mul(xw, xw)
    x3 = b.mul(x2, xw)
    # x3 + x + 5 == out
    b.assert_eq_lc({x3: 1, xw: 1}, 5, out)
    return b


@pytest.fixture(scope="module")
def proven():
    rng = random.Random(42)
    b = cubic_circuit(3)
    r1cs = b.build()
    wit = b.witness()
    assert check_witness(r1cs, wit)
    pk, vk = groth16.setup(r1cs, rng=rng)
    proof = groth16.prove(pk, r1cs, wit, rng=rng)
    return r1cs, pk, vk, proof, wit


def test_groth16_roundtrip(proven):
    r1cs, pk, vk, proof, wit = proven
    assert groth16.verify(vk, proof, [wit[1]])


def test_groth16_wrong_public_fails(proven):
    r1cs, pk, vk, proof, wit = proven
    assert not groth16.verify(vk, proof, [(wit[1] + 1) % R])


def test_groth16_tampered_proof_fails(proven):
    r1cs, pk, vk, proof, wit = proven
    bad = groth16.Proof(a=proof.c, b=proof.b, c=proof.a)
    assert not groth16.verify(vk, bad, [wit[1]])


def test_groth16_bad_witness_rejected(proven):
    r1cs, pk, vk, proof, wit = proven
    bad_wit = list(wit)
    bad_wit[2] = (bad_wit[2] + 1) % R     # x wire no longer matches out
    with pytest.raises(AssertionError):
        groth16.prove(pk, r1cs, bad_wit)


def test_groth16_multi_constraint():
    rng = random.Random(7)
    b = R1CSBuilder()
    out = b.public(0)
    ws = [b.wire(i + 2) for i in range(6)]
    acc = ws[0]
    for w in ws[1:]:
        acc = b.mul(acc, w)
    b.assert_eq_lc({acc: 1}, 0, out)
    prod = 1
    for i in range(6):
        prod = prod * (i + 2) % R
    b.set_value(out, prod)
    r1cs = b.build()
    wit = b.witness()
    assert check_witness(r1cs, wit)
    pk, vk = groth16.setup(r1cs, rng=rng)
    proof = groth16.prove(pk, r1cs, wit, rng=rng)
    assert groth16.verify(vk, proof, [prod])


def test_zkey_roundtrip(tmp_path, proven):
    """zkey container round-trip: persisted keys prove + verify."""
    from xlayer_prover_tpu.snark import zkey as zk_mod
    rng = random.Random(11)
    r1cs, pk, vk, proof, wit = proven
    zk = zk_mod.from_setup(pk, vk, r1cs)
    path = str(tmp_path / "test.zkey")
    zk_mod.write_zkey(zk, path)
    zk2 = zk_mod.read_zkey(path)
    pk2, vk2 = zk_mod.to_keys(zk2)
    proof2 = groth16.prove(pk2, r1cs, wit, rng=rng)
    assert groth16.verify(vk2, proof2, [wit[1]])
    assert groth16.verify(vk2, proof, [wit[1]])


def test_snarkjs_artifacts_roundtrip(tmp_path, proven):
    """snarkjs-format export + the independent from-file verifier (the
    CI contract, prover_e2e.yml:36-38 — snarkjs itself is not in this
    image, so verify_files re-implements `snarkjs groth16 verify` over
    the JSON artifacts alone)."""
    import json
    from xlayer_prover_tpu.snark import snarkjs_io
    r1cs, pk, vk, proof, wit = proven
    pubs = wit[1:1 + r1cs.n_public]
    vkp = str(tmp_path / "verification_key.json")
    prp = str(tmp_path / "proof.json")
    pup = str(tmp_path / "public.json")
    snarkjs_io.export_vk(vk, vkp)
    snarkjs_io.export_proof(proof, prp)
    snarkjs_io.export_publics(pubs, pup)
    # snarkjs layout sanity
    doc = json.load(open(prp))
    assert doc["protocol"] == "groth16" and doc["curve"] == "bn128"
    assert doc["pi_a"][2] == "1" and doc["pi_b"][2] == ["1", "0"]
    assert all(isinstance(v, str) for v in json.load(open(pup)))
    assert snarkjs_io.verify_files(vkp, pup, prp)
    # tampered public input -> reject
    bad = [str((int(p) + 1) % R) for p in pubs]
    badp = str(tmp_path / "public_bad.json")
    json.dump(bad, open(badp, "w"))
    assert not snarkjs_io.verify_files(vkp, badp, prp)
    # tampered proof point -> reject
    doc["pi_a"][0] = str((int(doc["pi_a"][0]) + 1))
    badpr = str(tmp_path / "proof_bad.json")
    json.dump(doc, open(badpr, "w"))
    assert not snarkjs_io.verify_files(vkp, pup, badpr)
