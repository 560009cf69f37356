"""Hash chains inside the zkEVM AIR: Main hashK/hashS/hashP rows bound to
the PaddingKK->KeccakF, PaddingSha256->Sha256F and PaddingPG->PoseidonG
chain circuits in ONE AIR at 2^18 (the smallest domain with a gate slot).

Covers the reference main.pil hash lookups (data access, length, digest +
block count) against src/sm/padding_kk*, padding_sha256*, padding_pg/ —
exercised end-to-end: ROM execution -> trace expansion -> constraint checks,
plus digest-correctness negatives.
"""

import hashlib

import numpy as np
import pytest

from xlayer_prover_tpu.executor.executor import Executor
from xlayer_prover_tpu.executor.rom import Rom
from xlayer_prover_tpu.ops.keccak import keccak256
from xlayer_prover_tpu.state.hashdb import HashDB

from tools.check_trace import check_trace

N_BITS = 18

K_DATA = bytes([0x01, 0x02, 0x03])
S_DATA = bytes([0xBE, 0xEF])
P_DATA = bytes([0xDE, 0xAD, 0xBE, 0xEF])


def hash_rom():
    """Writes one stream per hash family, then Len + Digest each."""
    prog = []
    labels = {}

    def line(**kw):
        prog.append(kw)
        return len(prog) - 1

    labels["start"] = line(CONST=0, setHASHPOS=1)
    # hashK at addr 7: 2-byte write + 1-byte write
    line(CONST=2, setD=1)
    line(CONSTL=0x0102, hashK=1, offset=7)
    line(CONSTL=0x03, hashK1=1, offset=7)
    line(CONSTL=3, hashKLen=1, offset=7)
    line(freeInTag={}, inFREE=1, hashKDigest=1, offset=7, setA=1)
    # hashS at addr 9: one 2-byte write
    line(CONST=0, setHASHPOS=1)
    line(CONSTL=0xBEEF, hashS=1, offset=9)
    line(CONSTL=2, hashSLen=1, offset=9)
    line(freeInTag={}, inFREE=1, hashSDigest=1, offset=9, setB=1)
    # hashP at addr 11: one 4-byte write
    line(CONST=0, setHASHPOS=1)
    line(CONST=4, setD=1)
    line(CONSTL=0xDEADBEEF, hashP=1, offset=11)
    line(CONSTL=4, hashPLen=1, offset=11)
    line(freeInTag={}, inFREE=1, hashPDigest=1, offset=11, setC=1)
    labels["finalizeExecution"] = len(prog)
    line()
    return Rom.from_json({"program": prog, "labels": labels,
                          "constants": {}})


@pytest.fixture(scope="module")
def hash_exec():
    ex = Executor(hash_rom(), n_bits=N_BITS, chunk_bits=2, limb_bits=8,
                  n_queries=4, max_steps=1 << 10)
    res = ex.execute(HashDB())
    return ex, res


@pytest.mark.slow
def test_digests_reach_registers(hash_exec):
    ex, res = hash_exec
    ctx = res.ctx
    assert ctx.done
    from xlayer_prover_tpu.executor.main_sm import fea_to_scalar
    assert fea_to_scalar(ctx.regs.A) == \
        int.from_bytes(keccak256(K_DATA), "big")
    assert fea_to_scalar(ctx.regs.B) == \
        int.from_bytes(hashlib.sha256(S_DATA).digest(), "big")
    assert ctx.counters.keccak_f == 1
    assert ctx.counters.sha256_f == 1
    assert len(ctx.required.padding_kk) == 1
    assert len(ctx.required.padding_sha) == 1
    assert len(ctx.required.padding_pg) == 1


@pytest.mark.slow
def test_full_air_trace_checks(hash_exec):
    ex, res = hash_exec
    assert ex.layout.keccak is not None and ex.layout.sha is not None
    assert check_trace(ex.air, res.const_np, res.cm1_np, res.publics) == []


@pytest.mark.slow
def test_wrong_sha_digest_fails(hash_exec):
    """A tampered hashS digest limb breaks the Main->PaddingSha lookup."""
    ex, res = hash_exec
    bad = res.cm1_np.copy()
    w = ex.layout.sha.ps.witness
    rows = np.nonzero(bad[:, w["lastHash"].index])[0]
    bad[rows[0], w["hash0"].index] ^= np.uint64(1)
    failures = check_trace(ex.air, res.const_np, bad, res.publics)
    assert any("plookup" in f for f in failures)


@pytest.mark.slow
def test_wrong_keccak_stream_byte_fails(hash_exec):
    """Flipping a PaddingKK data byte breaks the byte<->bit binding or the
    Main data-access lookup."""
    ex, res = hash_exec
    bad = res.cm1_np.copy()
    w = ex.layout.keccak.kk.witness
    col = w["freeIn"].index
    rows = np.nonzero(bad[:, col])[0]
    bad[rows[0], col] ^= np.uint64(1)
    assert check_trace(ex.air, res.const_np, bad, res.publics) != []
