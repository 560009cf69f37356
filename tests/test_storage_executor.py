"""Storage SM replay executor vs the real reference micro-ROM.

Replays a script of SMT get/set actions covering every reference mode
(insertNotFound, insertFound, update, zeroToZero, deleteNotFound,
deleteFound, deleteLast, get hit/miss) through the actual
config/scripts/storage_sm_rom.json program.  The micro-ROM's LATCH GET/SET
rows cross-check every replayed action against the recorded SMT result
(old/new root, full re-climbed key, value, level==0), so a completed replay
is itself the parity assertion (reference storage_executor.cpp:560-640).
"""

import os

import pytest

from xlayer_prover_tpu.executor.storage_executor import (SmtAction,
                                                         StorageExecutor)
from xlayer_prover_tpu.executor.storage_rom import StorageRom
from xlayer_prover_tpu.state.database import MemoryDB
from xlayer_prover_tpu.state.smt import Smt

ROM = "/root/reference/config/scripts/storage_sm_rom.json"

pytestmark = pytest.mark.skipif(not os.path.exists(ROM),
                                reason="reference storage ROM not present")

# keys chosen so path bits force: k1/k2 diverge at level 4 (insertFound),
# k3 sits alone on the other side of the root, k7 shares k3's first 4 bits
# (get-miss / zeroToZero against k3's leaf)
K1 = (4, 1, 1, 1)
K2 = (6, 1, 1, 1)
K3 = (5, 1, 1, 1)
K7 = (7, 1, 1, 1)


def _script():
    smt = Smt(MemoryDB())
    actions = []
    root = (0, 0, 0, 0)

    def do_set(key, value):
        nonlocal root
        res = smt.set(root, key, value)
        root = res.new_root
        actions.append(SmtAction(is_set=True, set_result=res))
        return res

    def do_get(key):
        res = smt.get(root, key)
        actions.append(SmtAction(is_set=False, get_result=res))
        return res

    modes = []
    modes.append(do_set(K1, 100).mode)            # insertNotFound
    modes.append(do_set(K2, 200 << 130).mode)     # insertFound (high half)
    modes.append(do_set(K3, 300).mode)            # insertNotFound
    modes.append(do_set(K1, 111).mode)            # update
    do_get(K1)                                    # get hit
    do_get(K7)                                    # get miss (finds K3 leaf)
    modes.append(do_set(K7, 0).mode)              # zeroToZero
    modes.append(do_set(K3, 0).mode)              # deleteNotFound
    modes.append(do_set(K2, 0).mode)              # deleteFound
    modes.append(do_set(K1, 0).mode)              # root delete -> empty tree
    do_get(K1)                                    # get miss on empty tree
    return actions, modes


def test_script_covers_all_modes():
    _, modes = _script()
    # the reference labels a root-leaf deletion "deleteNotFound" with a zero
    # new root (smt.cpp:719-729) — "deleteLast" is never produced
    assert modes == ["insertNotFound", "insertFound", "insertNotFound",
                     "update", "zeroToZero", "deleteNotFound",
                     "deleteFound", "deleteNotFound"]


def test_replay_all_modes():
    actions, _ = _script()
    ex = StorageExecutor(StorageRom.load(ROM))
    rows, pg, ck = ex.execute(actions)
    assert len(rows) > len(actions) * 10
    # every action hit its latch row exactly once
    assert sum(r["latchGet"] for r in rows) == 3
    assert sum(r["latchSet"] for r in rows) == 8
    # hashes were requested and are real PoseidonG permutations
    assert len(pg) > 10
    from xlayer_prover_tpu.native import poseidon_permute
    inp, out, tag = pg[0]
    assert tuple(poseidon_permute(list(inp))[:4]) == tuple(out)
    assert tag == 3
    # climb ops recorded for the key walks
    assert len(ck) > 5


def test_replay_empty_action_list():
    ex = StorageExecutor(StorageRom.load(ROM))
    rows, pg, ck = ex.execute([])
    assert rows  # ROM still runs to the end-polynomial idle row


E2E_VEC = ("/root/reference/testvectors/e2e/fork_9/input_executor_0.json")
E2E_ROM = "/root/reference/config/scripts/rom.json"


@pytest.mark.skipif(not (os.path.exists(E2E_VEC) and os.path.exists(E2E_ROM)),
                    reason="reference e2e testvectors not present")
def test_replay_real_batch_storage_actions():
    """Every SMT get/set the real fork_9 batch performs replays through the
    storage micro-ROM with all LATCH cross-checks passing — the Storage SM
    trace for a real testvector batch."""
    from xlayer_prover_tpu.executor import rom_functions as rf
    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
    from xlayer_prover_tpu.executor.rom import Rom as MainRom
    from xlayer_prover_tpu.state.hashdb import HashDB

    rom = MainRom.load(E2E_ROM)
    ex = MainExecutor(rom, max_steps=4_000_000)
    rf.register_all(ex)
    inp = BatchInput.load(E2E_VEC)
    h = HashDB()
    inp.load_db(h)
    ctx = Context(rom, h, input_vars=inp.input_vars())
    inp.setup_registers(ctx)
    ex.execute(ctx)
    assert ctx.done
    actions = list(ctx.required.storage)
    assert len(actions) > 10

    sx = StorageExecutor(StorageRom.load(ROM))
    rows, pg, ck = sx.execute(actions, max_rows=1 << 18)
    assert sum(r["latchGet"] + r["latchSet"] for r in rows) == len(actions)
    assert len(pg) > 100
