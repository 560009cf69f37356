"""ECRecoverPrecalc (executor/ec_precalc.py): the Jacobian 1-bit-save
ladder precomputed at ecrecover_store_args serves the ROM's
x/y{Add,Dbl}PointEc evals bit-exactly, and the real e2e batches produce
the same state root with and without it.

Reference: src/ecrecover/ecrecover.cpp:229-330 + :1418-1516,
main_executor.cpp:341-363, eval_command.cpp:2296-2347.
"""

import os

import pytest

from xlayer_prover_tpu.executor import ec_precalc
from xlayer_prover_tpu.executor import rom_functions as rf

ROM_PATH = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_{}.json"

P = ec_precalc.P
N = ec_precalc.N


def _find_valid_r(start: int) -> int:
    """First r >= start whose x-coordinate lies on the curve."""
    r = start
    while True:
        a3 = (r * r % P * r + 7) % P
        y = pow(a3, (P + 1) // 4, P)
        if y * y % P == a3:
            return r
        r += 1


def test_memo_entries_match_direct_math():
    sig = 0xDEADBEEF_CAFEBABE_12345678_9ABCDEF0 * (1 << 128) + 77
    r = _find_valid_r(0x1234567)
    s = ec_precalc.N_DIV_TWO - 3
    memo = ec_precalc.precalc(sig, r, s, 0x1B)
    assert memo is not None
    n_add = n_dbl = 0
    for key, (x3, y3) in memo.items():
        if key[0] == "add":
            _, x1, y1, x2, y2 = key
            assert rf._ec_add(x1, y1, x2, y2) == (x3, y3)
            n_add += 1
        else:
            _, x1, y1 = key
            assert rf._ec_dbl(x1, y1) == (x3, y3)
            n_dbl += 1
    # a 256-bit Shamir ladder: ~255 doublings, ~3/4*256 adds (x2 for the
    # symmetric add keys)
    assert n_dbl > 200
    assert n_add > 150


def test_invalid_signatures_return_none():
    r = _find_valid_r(99)
    assert ec_precalc.precalc(1, 0, 5, 0x1B) is None          # r = 0
    assert ec_precalc.precalc(1, N, 5, 0x1B) is None          # r too big
    assert ec_precalc.precalc(1, r, 0, 0x1B) is None          # s = 0
    assert ec_precalc.precalc(1, r, ec_precalc.N_DIV_TWO + 1,
                              0x1B) is None                   # s upper limit
    assert ec_precalc.precalc(1, r, 5, 0x1D) is None          # bad v


@pytest.mark.skipif(not os.path.exists(ROM_PATH),
                    reason="reference ROM absent")
def test_e2e_vector_precalc_parity_and_hits():
    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.state.hashdb import HashDB

    rom = Rom.load(ROM_PATH)

    def run(precalc: bool):
        ex = MainExecutor(rom, max_steps=4_000_000,
                          ecrecover_precalc=precalc)
        rf.register_all(ex)
        inp = BatchInput.load(VEC.format(0))
        h = HashDB()
        inp.load_db(h)
        ctx = Context(rom, h, input_vars=inp.input_vars())
        inp.setup_registers(ctx)
        ex.execute(ctx)
        return ctx

    on = run(True)
    off = run(False)
    assert on.done and off.done
    assert on.regs.SR == off.regs.SR
    assert on.counters.steps == off.counters.steps
    assert off.ec_memo_hits == 0
    # the vector carries signed txs -> the ladder memo must have served
    # the bulk of the EC evals (2 evals per point: x then y)
    assert on.ec_memo_hits > 500
