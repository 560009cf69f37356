"""Binary SM: trace expansion correctness + full prove/verify round trip."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import binary_sm
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.stark.air import AirBuilder


def _build(n_bits=11, chunk_bits=2):
    b = AirBuilder("binary-sm", n_bits, n_queries=4, fri_fold_bits=3)
    layout = binary_sm.build(b, n_bits, chunk_bits)
    air = b.compile()
    return air, layout


def test_expand_trace_semantics(rng):
    air, layout = _build()
    n = air.n
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    a = int(rng.integers(0, 1 << 63)) | (int(rng.integers(0, 1 << 63)) << 193)
    b = int(rng.integers(0, 1 << 63)) | (int(rng.integers(0, 1 << 63)) << 180)
    actions = [("ADD", a, b), ("SUB", a, b), ("AND", a, b), ("XOR", a, b)]
    results = binary_sm.expand_trace(layout, actions, cm1)
    M = (1 << 256) - 1
    assert results[0] == ((a + b) & M, int(a + b > M))
    assert results[1] == ((a - b) & M, int(a < b))
    assert results[2][0] == a & b
    assert results[3][0] == a ^ b
    # accumulators on the last row of each op hold the full values
    rpo = layout.rows_per_op
    for k, (_, val) in [(0, (None, (a + b) & M))]:
        last = (k + 1) * rpo - 1
        got = 0
        for j in range(8):
            got |= int(cm1[last, layout.witness[f"c{j}"].index]) << (32 * j)
        assert got == (a + b) & M


@pytest.mark.slow
def test_binary_sm_proves_and_verifies(rng):
    air, layout = _build()
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    binary_sm.fill_fixed(layout, const_np)
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    a = int(rng.integers(0, 1 << 60))
    b = int(rng.integers(0, 1 << 60))
    binary_sm.expand_trace(layout, [("ADD", a, b), ("XOR", a, b),
                                    ("SUB", b, a)], cm1)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1, [])
    assert verifier.verify(air, setup.verkey, proof)

    # tamper: flip one chunk -> lookup or recurrence must fail
    bad = cm1.copy()
    bad[5, layout.witness["c_chunk"].index] ^= 1
    with pytest.raises(Exception):
        proof_bad = prover.gen_proof(setup, bad, [])
        verifier.verify(air, setup.verkey, proof_bad)
