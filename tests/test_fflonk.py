"""fflonk: PLONK-ification + folded commitments + single Shplonk opening.

The reference ships Groth16 AND fflonk provers over the same circuits
(src/rapidsnark/fflonk_prover.hpp); here the same R1CS the Groth16 tests
prove converts to PLONK gates and proves under fflonk — protocol per the
fflonk paper (C0/C1/C2 packings on the 8th/4th/3rd roots of xi_seed^24,
derived quotient evaluations, W/W' pairing check)."""

import random

import pytest

from xlayer_prover_tpu.fields.bn254 import R
from xlayer_prover_tpu.snark import fflonk, groth16, plonk
from xlayer_prover_tpu.snark.r1cs import R1CSBuilder, check_witness


def cubic_circuit(x: int):
    b = R1CSBuilder()
    out = b.public((x ** 3 + x + 5) % R)
    xw = b.wire(x)
    x2 = b.mul(xw, xw)
    x3 = b.mul(x2, xw)
    b.assert_eq_lc({x3: 1, xw: 1}, 5, out)
    return b


@pytest.fixture(scope="module")
def proven():
    rng = random.Random(11)
    b = cubic_circuit(3)
    r1cs = b.build()
    wit = b.witness()
    assert check_witness(r1cs, wit)
    circ = plonk.r1cs_to_plonk(r1cs)
    vals = plonk.plonk_witness(circ, r1cs, wit)
    pubs = wit[1:1 + r1cs.n_public]
    assert plonk.check_plonk(circ, vals, pubs)
    pk, vk = fflonk.setup(circ, rng=rng)
    proof = fflonk.prove(pk, circ, vals, pubs, rng=rng)
    return r1cs, wit, circ, vals, pubs, pk, vk, proof


def test_fflonk_roundtrip(proven):
    _r1cs, _wit, _c, _v, pubs, _pk, vk, proof = proven
    assert fflonk.verify(vk, proof, pubs)


def test_fflonk_same_r1cs_as_groth16(proven):
    """The same R1CS proves under both SNARK backends (the reference's
    config.proverType groth16|fflonk switch)."""
    r1cs, wit, *_rest = proven
    rng = random.Random(12)
    pk, vk = groth16.setup(r1cs, rng=rng)
    g_proof = groth16.prove(pk, r1cs, wit, rng=rng)
    assert groth16.verify(vk, g_proof, wit[1:1 + r1cs.n_public])


def test_fflonk_rejects_tampered_eval(proven):
    import dataclasses
    _r, _w, _c, _v, pubs, _pk, vk, proof = proven
    bad = dict(proof.evals)
    bad["z"] = (bad["z"] + 1) % R
    assert not fflonk.verify(
        vk, dataclasses.replace(proof, evals=bad), pubs)


def test_fflonk_rejects_wrong_public(proven):
    _r, _w, _c, _v, pubs, _pk, vk, proof = proven
    assert not fflonk.verify(vk, proof, [(pubs[0] + 1) % R])


def test_fflonk_multi_constraint_circuit():
    """Wide linear combinations + several publics through the R1CS->PLONK
    conversion (accumulation gate chains + copy constraints)."""
    rng = random.Random(13)
    b = R1CSBuilder()
    xs = [b.public(v) for v in (3, 5, 9)]
    w1 = b.mul(xs[0], xs[1])                 # 15
    w2 = b.mul(w1, xs[2])                    # 135
    # 2*w2 + 3*w1 + x0 + 7 == out
    out_val = (2 * 135 + 3 * 15 + 3 + 7) % R
    out = b.wire(out_val)
    b.assert_eq_lc({w2: 2, w1: 3, xs[0]: 1}, 7, out)
    b.mul(out, out)
    r1cs = b.build()
    wit = b.witness()
    assert check_witness(r1cs, wit)
    circ = plonk.r1cs_to_plonk(r1cs)
    vals = plonk.plonk_witness(circ, r1cs, wit)
    pubs = wit[1:1 + r1cs.n_public]
    assert plonk.check_plonk(circ, vals, pubs)
    pk, vk = fflonk.setup(circ, rng=rng)
    proof = fflonk.prove(pk, circ, vals, pubs, rng=rng)
    assert fflonk.verify(vk, proof, pubs)
    assert not fflonk.verify(vk, proof, [pubs[0], pubs[1],
                                         (pubs[2] + 1) % R])


def test_fflonk_proof_is_constant_size(proven):
    """4 G1 points + 15 evaluations regardless of circuit size."""
    *_rest, proof = proven
    assert len(proof.evals) == 15
    for pt in (proof.c1, proof.c2, proof.w, proof.w2):
        assert len(pt) == 2
