"""SHA-256 chain (PaddingSha256 -> bit region -> Sha256F gates).

Covers the reference PaddingSha256/PaddingSha256Bit/Bits2FieldSha256/Sha256F
chain semantics (src/sm/padding_sha256*/ sha256_f/): FIPS-180 padding with
the big-endian bit-length suffix, Merkle-Damgard chaining via the connected
flag, digest limb extraction into Main's op packing, byte<->bit binding and
the packing connection into the gate circuit.  The full composite runs at
2^18 — marked slow; pad_bytes is tested fast.
"""

import hashlib

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import sha_chain_sm as sc
from xlayer_prover_tpu.models.zkevm.padding_sha_sm import (PaddingShaInput,
                                                           pad_bytes)
from xlayer_prover_tpu.stark.air import AirBuilder

from tools.check_trace import check_trace

N_BITS = 18


def _streams():
    return [
        PaddingShaInput(addr=3, data=bytes(range(1, 41)), reads=[32, 8],
                        digest_called=True),
        # 120 bytes -> 3 blocks (120+9 > 128): exercises connected chaining
        PaddingShaInput(addr=4, data=bytes(120), reads=[],
                        len_called=True, digest_called=True),
        PaddingShaInput(addr=5, data=b"", reads=[]),
    ]


@pytest.fixture(scope="module")
def chain():
    b = AirBuilder("schain", N_BITS, n_queries=4, fri_fold_bits=3)
    layout = sc.build(b, N_BITS)
    air = b.compile()
    const_np = np.zeros((air.n, air.const_width), dtype=np.uint64)
    sc.fill_fixed(layout, const_np)
    cm1 = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    sc.expand_into(layout, _streams(), cm1)
    return air, layout, const_np, cm1


def test_pad_bytes():
    assert len(pad_bytes(b"")) == 64
    assert pad_bytes(b"")[0] == 0x80
    assert pad_bytes(b"")[-8:] == bytes(8)
    p = pad_bytes(bytes(55))
    assert len(p) == 64 and p[55] == 0x80
    assert int.from_bytes(p[-8:], "big") == 8 * 55
    # 56 data bytes no longer fit the suffix in one block
    assert len(pad_bytes(bytes(56))) == 128


@pytest.mark.slow
def test_chain_trace_checks(chain):
    air, layout, const_np, cm1 = chain
    assert check_trace(air, const_np, cm1, []) == []


@pytest.mark.slow
def test_digest_limbs_match_sha256(chain):
    air, layout, const_np, cm1 = chain
    w = layout.ps.witness
    rows = np.nonzero(cm1[:, w["lastHash"].index])[0]
    found = {}
    for r in rows:
        addr = int(cm1[r, w["addr"].index])
        scalar = 0
        for q in range(8):
            scalar |= int(cm1[r, w[f"hash{q}"].index]) << (32 * q)
        found[addr] = scalar
    for s in _streams():
        want = int.from_bytes(hashlib.sha256(s.data).digest(), "big")
        assert found[s.addr] == want


@pytest.mark.slow
def test_tampered_chain_bit_fails(chain):
    """Flipping one chaining-state bit breaks either the feed-forward
    chain rule or the packing/connection into the gate circuit."""
    air, layout, const_np, cm1 = chain
    bad = cm1.copy()
    col = layout.witness["bit"].index
    # instance 2 (connected continuation of stream addr=4), state bit 100
    row = 2 * sc.INST_ROWS + 100
    bad[row, col] ^= np.uint64(1)
    assert check_trace(air, const_np, bad, []) != []


@pytest.mark.slow
def test_tampered_digest_fails(chain):
    air, layout, const_np, cm1 = chain
    bad = cm1.copy()
    w = layout.ps.witness
    rows = np.nonzero(bad[:, w["lastHash"].index])[0]
    bad[rows[0], w["hash0"].index] ^= np.uint64(1)
    failures = check_trace(air, const_np, bad, [])
    assert any("plookup" in f for f in failures)
