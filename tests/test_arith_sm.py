"""Arith SM (scaled instance): expander semantics + prove/verify round trip.

Uses the 32-bit/4-bit-limb instance of the production (256/16) geometry —
same circuit code, multi-row shifted constraints included.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import arith_sm
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.stark.air import AirBuilder


def _build(n_bits=9):
    # minimal 2-limb instance: exercises the multi-row-shift architecture
    # end-to-end while keeping the XLA CPU compile tractable on the 4-core
    # test host (production geometry is 256/16 — same code)
    b = AirBuilder("arith-sm", n_bits, n_queries=4, fri_fold_bits=3)
    layout = arith_sm.build(b, total_bits=16, limb_bits=8)
    air = b.compile()
    return air, layout


def test_expander_semantics(rng):
    air, layout = _build()
    cm1 = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    acts = [(0xFFFF, 0xFFFF, 0xFFFF), (123, 456, 42), (0, 0, 7)]
    results = arith_sm.expand_trace(layout, acts, cm1)
    for (a, b, c), (d, e) in zip(acts, results):
        assert a * b + c == (d << 16) + e


@pytest.mark.slow
def test_arith_proves_and_verifies(rng):
    air, layout = _build()
    const_np = np.zeros((air.n, air.const_width), dtype=np.uint64)
    arith_sm.fill_fixed(layout, const_np)
    cm1 = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    arith_sm.expand_trace(layout, [(0xBEEF, 0xBABE, 0x1234),
                                   (999, 888, 0)], cm1)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1, [])
    assert verifier.verify(air, setup.verkey, proof)

    # tamper: fake result limb -> must fail
    bad = cm1.copy()
    bad[0, layout.witness["e"].index] ^= 1
    with pytest.raises(Exception):
        proof_bad = prover.gen_proof(setup, bad, [])
        verifier.verify(air, setup.verkey, proof_bad)
