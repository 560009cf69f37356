"""PaddingPG SM circuit: trace checks, proof round trip, tampering.

Builds a standalone PaddingPG + PoseidonG composite (the hashP sponge
chain without the Main SM), replays byte streams with chunk reads, and
checks the reference semantics (padding_pg_executor.cpp): 0x01/0x80
padding, 7-byte little-endian element packing, chained block hashes,
big-endian chunk-read registers.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import padding_pg_sm, poseidon_g_sm
from xlayer_prover_tpu.models.zkevm.padding_pg_sm import (PaddingPGInput,
                                                          linear_hash_blocks,
                                                          pad_bytes)
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.stark.air import AirBuilder, Const

from tools.check_trace import check_trace

N_BITS = 11


def _build(n_bits=N_BITS):
    b = AirBuilder("padpg", n_bits, n_queries=8, fri_fold_bits=3)
    ppl = padding_pg_sm.build(b, n_bits)
    posl = poseidon_g_sm.build(b, n_bits)
    # block rows -> PoseidonG instances (same binding as zkevm_air)
    pg_table = ([posl.witness[f"ps{j}"] for j in range(12)]
                + [posl.witness[f"ps{j}"]
                   .shifted(poseidon_g_sm.ROWS_PER_PERM - 1)
                   for j in range(4)])
    f_cols, f_sel = padding_pg_sm.poseidon_lookup_cols(ppl)
    b.plookup(f_cols, pg_table, f_sel=f_sel, t_sel=posl.fixed["PFIRST"])
    air = b.compile()
    return air, ppl, posl


def _traces(air, ppl, posl, inputs):
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    padding_pg_sm.fill_fixed(ppl, const_np)
    poseidon_g_sm.fill_fixed(posl, const_np)
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    pg = padding_pg_sm.expand_into(ppl, inputs, cm1)
    poseidon_g_sm.expand_into(posl, pg, cm1)
    return const_np, cm1


def _streams():
    return [
        PaddingPGInput(addr=7, data=bytes(range(1, 21)),
                       reads=[20], digest_called=True),
        PaddingPGInput(addr=8, data=b"", reads=[], len_called=True),
        # 60-byte stream crosses a block boundary; mixed read sizes
        PaddingPGInput(addr=9, data=bytes(range(60)),
                       reads=[32, 7, 1, 20], digest_called=True,
                       len_called=True),
    ]


def test_linear_hash_matches_host():
    from xlayer_prover_tpu.state.witness import _linear_hash_bytes
    for data in (b"", b"\x01", bytes(range(100))):
        blocks = linear_hash_blocks(pad_bytes(data))
        assert tuple(blocks[-1][1]) == _linear_hash_bytes(data)


def test_padding_trace_checks():
    air, ppl, posl = _build()
    const_np, cm1 = _traces(air, ppl, posl, _streams())
    assert check_trace(air, const_np, cm1, []) == []


def test_latch_rows_expose_reads():
    """Every read latch exposes (addr, pos, len, value) exactly as a Main
    hashP row would present it."""
    air, ppl, posl = _build()
    const_np, cm1 = _traces(air, ppl, posl, _streams())
    w = ppl.witness
    latch = cm1[:, w["crLatch"].index]
    rows = np.nonzero(latch)[0]
    # find the 32-byte read of stream addr=9
    data = bytes(range(60))
    want = int.from_bytes(data[:32], "big")
    found = False
    for r in rows:
        if cm1[r, w["addr"].index] == 9 and cm1[r, w["crLen"].index] == 32:
            val = 0
            for k in range(8):
                val += int(cm1[r, w[f"crV{k}"].index]) << (32 * k)
            pos = (int(cm1[r, w["len"].index])
                   - int(cm1[r, w["rem"].index])
                   - int(cm1[r, w["crLen"].index]) + 1)
            if pos == 0:
                assert val == want
                found = True
    assert found


def test_tampered_byte_fails():
    air, ppl, posl = _build()
    const_np, cm1 = _traces(air, ppl, posl, _streams())
    w = ppl.witness
    # flip a data byte without fixing acc: element accumulation breaks
    cm1[1, w["freeIn"].index] ^= 1
    assert check_trace(air, const_np, cm1, []) != []


def test_tampered_digest_fails():
    air, ppl, posl = _build()
    const_np, cm1 = _traces(air, ppl, posl, _streams())
    w = ppl.witness
    rows = np.nonzero(cm1[:, w["lastHash"].index])[0]
    r = rows[0]
    cm1[r, w["curHash0"].index] = \
        (int(cm1[r, w["curHash0"].index]) + 1) % prover.P
    failures = check_trace(air, const_np, cm1, [])
    assert any("plookup" in f for f in failures)


@pytest.mark.slow
def test_padding_pg_proof_roundtrip():
    air, ppl, posl = _build()
    const_np, cm1 = _traces(air, ppl, posl, _streams())
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1, [])
    assert verifier.verify(air, setup.verkey, proof)
    # tamper a data byte consistently with the byte table (identity
    # constraints break; the prover still produces a proof)
    bad = cm1.copy()
    w = ppl.witness
    bad[1, w["freeIn"].index] ^= np.uint64(1)
    proof = prover.gen_proof(setup, bad, [])
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)
    # tampering the exposed digest breaks the PoseidonG lookup: the
    # prover itself refuses at the h1/h2 split
    from xlayer_prover_tpu.stark.lookup import LookupError_
    bad = cm1.copy()
    rows = np.nonzero(bad[:, w["lastHash"].index])[0]
    bad[rows[0], w["curHash1"].index] = \
        (int(bad[rows[0], w["curHash1"].index]) + 1) % prover.P
    with pytest.raises(LookupError_):
        prover.gen_proof(setup, bad, [])
