"""Full stack: zkASM program -> Main SM -> SM expansion -> proof -> verify.

The complete pipeline the reference runs for a batch (executor.execute then
Starks::genProof), on a mini-ROM program exercising binary ops and memory.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.executor.executor import Executor
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.state.hashdb import HashDB


def _program():
    # A=a, B=b; C=A+B (bin ADD); write C to mem[7]; read back; XOR A^B
    return [
        {"CONSTL": "123456789123456789", "setA": 1},
        {"CONSTL": "987654321987654321", "setB": 1},
        {"freeInTag": {"op": "functionCall", "funcName": "binResult",
                       "params": []}, "inFREE": "1",
         "bin": 1, "binOpcode": 0, "setC": 1},
        {"inC": "1", "mOp": 1, "mWR": 1, "offset": 7},
        {"freeInTag": {}, "inFREE": "1", "mOp": 1, "offset": 7, "setD": 1},
        {"freeInTag": {"op": "functionCall", "funcName": "xorResult",
                       "params": []}, "inFREE": "1",
         "bin": 1, "binOpcode": 7, "setE": 1},
        {"CONST": 0},
    ]


@pytest.mark.slow
def test_program_to_proof():
    rom = Rom.from_json({"program": _program(),
                         "labels": {"start": 0, "finalizeExecution": 6},
                         "constants": {}})
    ex = Executor(rom, n_bits=11, chunk_bits=2, limb_bits=4, n_queries=4, max_steps=50)
    a, b = 123456789123456789, 987654321987654321
    ex.functions["binResult"] = lambda c: a + b
    ex.functions["xorResult"] = lambda c: a ^ b

    result = ex.execute(HashDB())
    ctx = result.ctx
    assert len(ctx.required.binary) == 2
    assert len(ctx.required.memory) == 2

    setup = prover.Setup.build(ex.air, result.const_np)
    proof = prover.gen_proof(setup, result.cm1_np, result.publics)
    assert verifier.verify(ex.air, setup.verkey, proof)
