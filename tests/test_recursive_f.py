"""recursiveF commitment stack: Poseidon-BN254, arity-16 Merkle,
TranscriptBN128, and a full STARK proven over the BN128 scheme."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.toy import fib
from xlayer_prover_tpu.ops import poseidon_bn254
from xlayer_prover_tpu.stark import commitment, prover, verifier

FR_P = poseidon_bn254.P


def test_poseidon_bn254_kats():
    """Canonical circomlib known answers."""
    assert poseidon_bn254.hash_n([1, 2]) == \
        7853200120776062878684798364095072458815029376092732009249414926327459813530
    assert poseidon_bn254.hash_n([1]) == \
        18586133768512220936620570745912940619677854269274689475585506675881198879027


def test_bn128_tree_roundtrip():
    rng = np.random.default_rng(3)
    rows = rng.integers(0, (1 << 64) - (1 << 32), size=(50, 9),
                        dtype=np.uint64)
    scheme = commitment.BN128Scheme()
    tree = scheme.merkelize(rows, 9)
    root = scheme.root(tree)
    for idx in (0, 7, 17, 49):
        values, siblings = scheme.open(tree, rows, idx)
        assert scheme.verify(root, idx, values, siblings)
        bad = list(values)
        bad[0] = (bad[0] + 1) % FR_P
        assert not scheme.verify(root, idx, bad, siblings)


def test_transcript_bn128_deterministic():
    t1 = commitment.TranscriptBN128()
    t2 = commitment.TranscriptBN128()
    t1.put([1, 2, 3])
    t2.put([1, 2, 3])
    assert t1.get_field() == t2.get_field()
    assert t1.get_permutations(4, 10) == t2.get_permutations(4, 10)
    t3 = commitment.TranscriptBN128()
    t3.put([1, 2, 4])
    assert t3.get_field() != t2.get_field()


@pytest.mark.slow
def test_stark_over_bn128_scheme():
    """The StarkRecursiveF pattern: the same 5-round prover, BN128
    commitments (starkRecursiveF.cpp:151-242)."""
    air = fib.build_air(n_bits=4, n_queries=2)
    air.scheme = "bn128"
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1_np, publics)
    assert len(proof.roots[0]) == 1          # single Fr root
    assert verifier.verify(air, setup.verkey, proof)
    bad = list(publics)
    bad[0] = (bad[0] + 1) % prover.P
    proof2 = prover.gen_proof(setup, cm1_np, bad)
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof2)
