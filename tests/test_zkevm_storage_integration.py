"""Main SM <-> Storage SM integration on a real testvector batch.

The full zkEVM composite (Main + Binary + Memory + Arith + PoseidonG +
Storage + ClimbKey with every cross-SM binding: reference main.pil storage
lookups / key_utils.cpp key derivation) is validated with the host trace
checker (tools/check_trace.py) — identity constraints + lookup membership
over the complete 2^16-row trace in seconds, with tamper-negative cases
proving the storage bindings actually constrain:

  * forging an sRD value -> the latchGet lookup breaks;
  * forging the committed sKey -> the PoseidonG key-derivation lookup
    breaks;
  * forging the Storage SM's OLD_ROOT at a latch row -> the register
    algebra / Main binding breaks;
  * forging incCnt (the cntPoseidonG increment) -> the latch lookup
    breaks (counter soundness, main_executor.cpp:2557 incCounter=phc+2).

The full proof round trip of this circuit is tests/test_zkevm_proof.py::
test_real_batch_proof (slow).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from tools.check_trace import check_trace  # noqa: E402

from xlayer_prover_tpu.executor.input import BatchInput  # noqa: E402
from xlayer_prover_tpu.executor.rom import Rom  # noqa: E402
from xlayer_prover_tpu.executor.storage_rom import StorageRom  # noqa: E402
from xlayer_prover_tpu.prover_service import BatchProver  # noqa: E402
from xlayer_prover_tpu.state.hashdb import HashDB  # noqa: E402

REF_ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
REF_SROM = "/root/reference/config/scripts/storage_sm_rom.json"
REF_VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_ROM) and os.path.exists(REF_SROM)
         and os.path.exists(REF_VEC)),
    reason="reference artifacts not present")

P = 0xFFFFFFFF00000001


@pytest.fixture(scope="module")
def batch_trace():
    rom = Rom.load(REF_ROM)
    srom = StorageRom.load(REF_SROM)
    engine = BatchProver(rom, n_bits=16, max_steps=1 << 15,
                         storage_rom=srom)
    inp = BatchInput.load(REF_VEC)
    hashdb = HashDB()
    inp.load_db(hashdb)
    res = engine.executor.execute(hashdb, input_vars=inp.input_vars(),
                                  setup_registers=inp.setup_registers)
    return engine, res


def _first_flag_row(cm1, col):
    rows = np.nonzero(cm1[:, col.index])[0]
    assert len(rows) > 0
    return int(rows[0])


def test_integrated_trace_satisfies_all_constraints(batch_trace):
    engine, res = batch_trace
    assert len(res.ctx.required.storage) > 0, "batch has storage ops"
    failures = check_trace(engine.air, res.const_np, res.cm1_np,
                           res.publics, verbose=False)
    assert failures == []


def test_forged_sread_value_breaks_latch_lookup(batch_trace):
    """Forge the value an sRD returns (consistently through FREE and op so
    the op-accumulator identity still holds) — only the Storage latchGet
    lookup can catch it."""
    engine, res = batch_trace
    mw = engine.executor.layout.main.witness
    bad = res.cm1_np.copy()
    row = _first_flag_row(bad, mw["sRD"])
    for name in ("op0", "FREE0"):
        col = mw[name].index
        bad[row, col] = (int(bad[row, col]) + 1) % P
    failures = check_trace(engine.air, res.const_np, bad, res.publics,
                           verbose=False, sections=("plookup",))
    assert any("plookup" in f for f in failures)


def test_forged_skey_breaks_key_derivation(batch_trace):
    engine, res = batch_trace
    mw = engine.executor.layout.main.witness
    bad = res.cm1_np.copy()
    row = _first_flag_row(bad, mw["sRD"])
    col = mw["sKey0"].index
    bad[row, col] = (int(bad[row, col]) + 1) % P
    failures = check_trace(engine.air, res.const_np, bad, res.publics,
                           verbose=False, sections=("plookup",))
    assert any("plookup" in f for f in failures)


def test_forged_storage_root_breaks(batch_trace):
    engine, res = batch_trace
    sw = engine.executor.layout.storage.witness
    bad = res.cm1_np.copy()
    row = _first_flag_row(bad, sw["latchGet"])
    col = sw["OLD_ROOT0"].index
    bad[row, col] = (int(bad[row, col]) + 1) % P
    failures = check_trace(engine.air, res.const_np, bad, res.publics,
                           verbose=False, sections=("identity", "plookup"),
                           stop_at_first=True)
    assert failures != []


def test_forged_counter_increment_breaks(batch_trace):
    engine, res = batch_trace
    mw = engine.executor.layout.main.witness
    bad = res.cm1_np.copy()
    row = _first_flag_row(bad, mw["sRD"])
    col = mw["incCnt"].index
    bad[row, col] = (int(bad[row, col]) + 7) % P
    failures = check_trace(engine.air, res.const_np, bad, res.publics,
                           verbose=False, sections=("plookup",))
    assert failures != []
