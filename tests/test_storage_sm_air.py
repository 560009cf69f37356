"""Storage SM + ClimbKey circuits: proof round trip over the real micro-ROM.

Builds a composite AIR of Storage + ClimbKey + PoseidonG, replays the
all-modes SMT script (test_storage_executor._script) into committed
columns, proves and verifies; tamper-negative cases flip a register value
and a Poseidon output.
"""

import os

import numpy as np
import pytest

from xlayer_prover_tpu.executor.storage_rom import StorageRom
from xlayer_prover_tpu.models.zkevm import (climb_key_sm, poseidon_g_sm,
                                            storage_sm)
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.stark.air import AirBuilder

from test_storage_executor import _script

ROM = "/root/reference/config/scripts/storage_sm_rom.json"

pytestmark = pytest.mark.skipif(not os.path.exists(ROM),
                                reason="reference storage ROM not present")

N_BITS = 11


def _build(n_bits=N_BITS):
    rom = StorageRom.load(ROM)
    b = AirBuilder("storage", n_bits, n_queries=8, fri_fold_bits=3)
    sl = storage_sm.build(b, rom, n_bits)
    cl = climb_key_sm.build(b, n_bits)
    pl = poseidon_g_sm.build(b, n_bits)
    storage_sm.bind(b, sl, cl, pl)
    air = b.compile()
    return air, sl, cl, pl


def _traces(air, sl, cl, pl, actions):
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    storage_sm.fill_fixed(sl, const_np)
    climb_key_sm.fill_fixed(cl, const_np)
    poseidon_g_sm.fill_fixed(pl, const_np)
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    pg, ck = storage_sm.expand_into(sl, actions, cm1)
    climb_key_sm.expand_into(cl, ck, cm1)
    poseidon_g_sm.expand_into(pl, [list(t[0]) for t in pg], cm1)
    return const_np, cm1


@pytest.fixture(scope="module")
def proven():
    actions, _ = _script()
    air, sl, cl, pl = _build()
    const_np, cm1 = _traces(air, sl, cl, pl, actions)
    setup = prover.Setup.build(air, const_np)
    return air, sl, cl, pl, setup, cm1


@pytest.mark.slow
def test_storage_proof_roundtrip(proven):
    air, sl, cl, pl, setup, cm1 = proven
    proof = prover.gen_proof(setup, cm1, [])
    assert verifier.verify(air, setup.verkey, proof)


@pytest.mark.slow
def test_storage_tampered_root_fails(proven):
    air, sl, cl, pl, setup, cm1 = proven
    bad = cm1.copy()
    col = sl.witness["OLD_ROOT0"].index
    rows = np.nonzero(bad[:, col])[0]
    bad[rows[0], col] = (int(bad[rows[0], col]) + 1) % prover.P
    proof = prover.gen_proof(setup, bad, [])
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)


@pytest.mark.slow
def test_storage_tampered_poseidon_fails(proven):
    """Forging a hash free-input requires forging the PoseidonG block."""
    air, sl, cl, pl, setup, cm1 = proven
    bad = cm1.copy()
    ps0 = pl.witness["ps0"].index
    # corrupt a permutation output row (last row of the first block)
    bad[30, ps0] = (int(bad[30, ps0]) + 1) % prover.P
    proof = prover.gen_proof(setup, bad, [])
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)


def test_climb_chunks_reject_overflow():
    """The ClimbKey expander refuses inputs above PRE_CLIMB_UP_LIMIT."""
    n = 1 << 6
    b = AirBuilder("ck", 6, n_queries=4)
    cl = climb_key_sm.build(b, 6)
    air = b.compile()
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    with pytest.raises(AssertionError):
        climb_key_sm.expand_into(cl, [((climb_key_sm.LIMIT + 1, 0, 0, 0),
                                       0, 1)], cm1)
