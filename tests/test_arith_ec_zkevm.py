"""Arith EC equations inside the zkEVM AIR: Main arithEq1-5 rows bound to
the Arith EC SM circuit in one AIR (kind tag + six operand bindings),
end-to-end: ROM execution -> trace expansion -> constraint checks.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.executor.executor import Executor
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.state.hashdb import HashDB

from tests.test_arith_ec import BN_P, GX, GY, ec_add, ec_double

from tools.check_trace import check_trace

N_BITS = 12

D2 = ec_double(GX, GY)
D3 = ec_add(GX, GY, *D2)
MUL_X3 = (3 * 5 - 4 * 6) % BN_P
MUL_Y3 = (4 * 5 + 3 * 6) % BN_P


def arith_rom():
    prog = []
    labels = {}

    def line(**kw):
        prog.append(kw)
        return len(prog) - 1

    # EC double: 2*G
    labels["start"] = line(CONSTL=GX, setA=1)
    line(CONSTL=GY, setB=1)
    line(CONSTL=D2[0], setE=1)
    line(CONSTL=D2[1], arithEq2=1)
    # EC add: G + 2G
    line(CONSTL=D2[0], setC=1)
    line(CONSTL=D2[1], setD=1)
    line(CONSTL=D3[0], setE=1)
    line(CONSTL=D3[1], arithEq1=1)
    # BN254 Fp2 mul: (3+4i)*(5+6i)
    line(CONSTL=3, setA=1)
    line(CONSTL=4, setB=1)
    line(CONSTL=5, setC=1)
    line(CONSTL=6, setD=1)
    line(CONSTL=MUL_X3, setE=1)
    line(CONSTL=MUL_Y3, arithEq3=1)
    # Fp2 sub: (3+4i)-(5+6i)
    line(CONSTL=(3 - 5) % BN_P, setE=1)
    line(CONSTL=(4 - 6) % BN_P, arithEq5=1)
    labels["finalizeExecution"] = len(prog)
    line()
    return Rom.from_json({"program": prog, "labels": labels,
                          "constants": {}})


@pytest.fixture(scope="module")
def ec_exec():
    ex = Executor(arith_rom(), n_bits=N_BITS, chunk_bits=2, limb_bits=8,
                  n_queries=4, max_steps=1 << 10)
    res = ex.execute(HashDB())
    return ex, res


def test_actions_recorded(ec_exec):
    ex, res = ec_exec
    ctx = res.ctx
    assert ctx.done
    kinds = [a[0] for a in ctx.required.arith]
    assert kinds == [2, 1, 3, 5]
    assert ctx.counters.arith == 4


def test_full_air_trace_checks(ec_exec):
    ex, res = ec_exec
    assert ex.layout.arith_ec is not None
    assert check_trace(ex.air, res.const_np, res.cm1_np, res.publics) == []


def test_tampered_ec_result_fails(ec_exec):
    """Corrupting Main's op (y3) on the ECDBL row breaks the binding."""
    ex, res = ec_exec
    bad = res.cm1_np.copy()
    mw = ex.layout.main.witness
    rows = np.nonzero(res.cm1_np[:, mw["arithEq2"].index])[0]
    bad[rows[0], mw["op0"].index] ^= np.uint64(1)
    failures = check_trace(ex.air, res.const_np, bad, res.publics)
    assert any("plookup" in f for f in failures)


def test_tampered_sm_slope_fails(ec_exec):
    ex, res = ec_exec
    bad = res.cm1_np.copy()
    bad[2, ex.layout.arith_ec.witness["s"].index] ^= np.uint64(1)
    assert check_trace(ex.air, res.const_np, bad, res.publics) != []
