"""Keccak chain (PaddingKK -> sponge bit region -> KeccakF gates).

Covers the reference PaddingKK/PaddingKKBit/Bits2Field/KeccakF chain
semantics: multirate padding, sponge chaining with the connected flag,
digest limb extraction, byte<->bit binding, and the packing connection
into the gate circuit.  The full composite runs at 2^18 (one 48-lane
gate slot) — marked slow; the host helpers are tested fast.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import keccak_chain_sm as kc
from xlayer_prover_tpu.models.zkevm.padding_kk_sm import (PaddingKKInput,
                                                          pad_bytes)
from xlayer_prover_tpu.ops.keccak import keccak256
from xlayer_prover_tpu.stark.air import AirBuilder

from tools.check_trace import check_trace

N_BITS = 18


def _streams():
    return [
        PaddingKKInput(addr=3, data=bytes(range(1, 41)), reads=[32, 8],
                       digest_called=True),
        # 200 bytes -> 2 blocks: exercises connected chaining
        PaddingKKInput(addr=4, data=bytes(200), reads=[],
                       len_called=True, digest_called=True),
        PaddingKKInput(addr=5, data=b"", reads=[]),
    ]


@pytest.fixture(scope="module")
def chain():
    b = AirBuilder("kchain", N_BITS, n_queries=4, fri_fold_bits=3)
    layout = kc.build(b, N_BITS)
    air = b.compile()
    const_np = np.zeros((air.n, air.const_width), dtype=np.uint64)
    kc.fill_fixed(layout, const_np)
    cm1 = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    kc.expand_into(layout, _streams(), cm1)
    return air, layout, const_np, cm1


def test_pad_bytes():
    assert len(pad_bytes(b"")) == 136
    assert pad_bytes(b"")[0] == 0x01
    assert pad_bytes(b"")[-1] == 0x80
    p = pad_bytes(bytes(135))
    assert len(p) == 136 and p[-1] == 0x81


@pytest.mark.slow
def test_chain_trace_checks(chain):
    air, layout, const_np, cm1 = chain
    assert check_trace(air, const_np, cm1, []) == []


@pytest.mark.slow
def test_digest_limbs_match_keccak256(chain):
    air, layout, const_np, cm1 = chain
    w = layout.kk.witness
    rows = np.nonzero(cm1[:, w["lastHash"].index])[0]
    found = {}
    for r in rows:
        addr = int(cm1[r, w["addr"].index])
        scalar = 0
        for q in range(8):
            scalar |= int(cm1[r, w[f"hash{q}"].index]) << (32 * q)
        found[addr] = scalar
    for s in _streams():
        want = int.from_bytes(keccak256(s.data), "big")
        assert found[s.addr] == want


@pytest.mark.slow
def test_tampered_sponge_bit_fails(chain):
    """Flipping one input-state bit breaks either the XOR chain or the
    packing/connection into the gate circuit."""
    air, layout, const_np, cm1 = chain
    bad = cm1.copy()
    col = layout.witness["sIn"].index
    # instance 1 (connected continuation of stream addr=4), bit 100
    row = 1 * kc.STATE_BITS + 100
    bad[row, col] ^= np.uint64(1)
    assert check_trace(air, const_np, bad, []) != []


@pytest.mark.slow
def test_tampered_digest_fails(chain):
    air, layout, const_np, cm1 = chain
    bad = cm1.copy()
    w = layout.kk.witness
    rows = np.nonzero(bad[:, w["lastHash"].index])[0]
    bad[rows[0], w["hash0"].index] ^= np.uint64(1)
    failures = check_trace(air, const_np, bad, [])
    assert any("plookup" in f for f in failures)
