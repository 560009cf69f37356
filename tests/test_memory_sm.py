"""Memory SM: consistency circuit prove/verify + tamper rejection."""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import memory_sm
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.stark.air import AirBuilder


def _build(n_bits=6):
    b = AirBuilder("memory-sm", n_bits, n_queries=4, fri_fold_bits=2)
    layout = memory_sm.build(b, n_bits)
    air = b.compile()
    return air, layout


def _actions():
    # interleaved writes/reads across 3 addresses (Main SM style)
    return [
        ("W", 5, 100, 0),
        ("R", 5, 100, 2),
        ("W", 9, 7, 3),
        ("R", 5, 100, 4),
        ("W", 5, 200, 6),
        ("R", 9, 7, 7),
        ("R", 5, 200, 9),
        ("R", 12, 0, 10),   # first access read -> zero
    ]


def test_memory_sm_proves_and_verifies():
    air, layout = _build()
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    memory_sm.fill_fixed(layout, const_np)
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    memory_sm.expand_trace(layout, _actions(), cm1)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1, [])
    assert verifier.verify(air, setup.verkey, proof)


def test_memory_sm_rejects_wrong_read():
    air, layout = _build()
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    memory_sm.fill_fixed(layout, const_np)
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    bad = list(_actions())
    bad[3] = ("R", 5, 999, 4)   # read returns a never-written value
    memory_sm.expand_trace(layout, bad, cm1)
    with pytest.raises(Exception):
        setup = prover.Setup.build(air, const_np)
        proof = prover.gen_proof(setup, cm1, [])
        verifier.verify(air, setup.verkey, proof)
