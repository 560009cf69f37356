"""Native SMT walk in the fast-path executor (nexec).

The sRD/sWR lines run fully in C (storage-key Poseidon + the full
Smt::set/get insert/update/delete/restructure semantics of
state/smt.py); these tests pin bit-exactness against the Python
interpreter on the real fork_9 e2e vectors and the callback-count drop.
"""

import os

import pytest

from xlayer_prover_tpu.executor import rom_functions as rf
from xlayer_prover_tpu.executor.input import BatchInput
from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
from xlayer_prover_tpu.executor.nexec import NativeMainExecutor, available
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.state.hashdb import HashDB

VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_{}.json"

pytestmark = pytest.mark.skipif(not available(),
                                reason="libnexec.so not built")


@pytest.fixture(scope="module")
def engines():
    rom = Rom.load_fork(9)
    nat = NativeMainExecutor(rom, max_steps=1 << 22)
    rf.register_all(nat.py)
    pyex = MainExecutor(rom, max_steps=1 << 22)
    rf.register_all(pyex)
    return rom, nat, pyex


def _run(rom, ex, inp):
    hdb = HashDB()
    inp.load_db(hdb)
    ctx = Context(rom, hdb, input_vars=inp.input_vars())
    inp.setup_registers(ctx)
    ex.execute(ctx)
    return ctx, hdb


@pytest.mark.parametrize("k", range(4))
def test_native_smt_bit_exact(engines, k):
    path = VEC.format(k)
    if not os.path.exists(path):
        pytest.skip("testvector absent")
    rom, nat, pyex = engines
    inp = BatchInput.load(path)
    cn, hn = _run(rom, nat, inp)
    cp, hp = _run(rom, pyex, inp)
    assert list(cn.regs.SR) == list(cp.regs.SR)
    assert cn.counters.poseidon_g == cp.counters.poseidon_g
    assert cn.counters.steps == cp.counters.steps
    # every node the python walk created exists in the native overlay too
    # (consolidation sees identical state)
    ov_n = hn.batches["batch"].overlay
    ov_p = hp.batches["batch"].overlay
    assert ov_n == ov_p


def test_storage_lines_stay_native(engines):
    """sRD/sWR no longer round-trip through Python: the callback count on
    vector 0 drops below the storage-line count (94 -> ~58 measured)."""
    path = VEC.format(0)
    if not os.path.exists(path):
        pytest.skip("testvector absent")
    rom, nat, _ = engines
    calls = [0]
    storage_calls = [0]
    orig = nat.py.execute_line

    def counting(ctx, line, step):
        calls[0] += 1
        if line.flag("sRD") or line.flag("sWR"):
            # only storage lines with attached tracer commands may defer
            assert line.cmd_before or line.cmd_after
            storage_calls[0] += 1
        return orig(ctx, line, step)

    nat.py.execute_line = counting
    try:
        _run(rom, nat, BatchInput.load(path))
    finally:
        nat.py.execute_line = orig
    assert calls[0] < 70          # was 94 with python sRD/sWR
    assert storage_calls[0] < 10
