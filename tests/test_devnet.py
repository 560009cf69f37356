"""Synthetic devnet: signer + genesis + witness/datastream encoders.

Self-contained semantic e2e: build a genesis with known accounts, sign a
real EIP-155 transfer, encode the witness + datastream, and run the FULL
stateless path (witness2db + dataStream2batch -> fork_9 ROM executor),
asserting the EVM state transition — no reference testvector involved.
"""

import os

import pytest

from xlayer_prover_tpu.state.datastream import (batch_to_l2_data,
                                                datastream2batch)
from xlayer_prover_tpu.state.witness import witness2db
from xlayer_prover_tpu.utils import devnet

REF_ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
CHAIN = 1001
PRIV1, PRIV2 = 0xA11CE, 0xB0B


@pytest.fixture(scope="module")
def genesis():
    a1, a2 = devnet.address_of(PRIV1), devnet.address_of(PRIV2)
    g = devnet.build_genesis([
        devnet.Account(address=a1, balance=10 ** 18),
        devnet.Account(address=a2, balance=5),
    ])
    return a1, a2, g


def test_address_of_known_vector():
    # keccak(pub(1))[12:] — the canonical generator-point address
    assert devnet.address_of(1) == \
        0x7E5F4552091A69125D5DFCB7B8C2659029395BDF


def test_witness_roundtrip(genesis):
    a1, a2, g = genesis
    w = devnet.encode_witness(g)
    res = witness2db(w)
    assert res.root4 == g.root
    # the witness reconstructs exactly the reachable sub-tree
    for k, v in res.db.items():
        assert g.db.nodes[k] == v


def test_witness_with_code_roundtrip():
    a = devnet.address_of(0xC0DE)
    code = bytes(range(1, 64))
    g = devnet.build_genesis([
        devnet.Account(address=a, balance=7, nonce=3, code=code,
                       storage={0x01: 0xBEEF}),
    ])
    res = witness2db(devnet.encode_witness(g))
    assert res.root4 == g.root
    assert list(res.programs.values()) == [code]


def test_datastream_roundtrip():
    tx = devnet.sign_legacy_tx(nonce=0, gas_price=10 ** 9, gas=21000,
                               to=devnet.address_of(PRIV2), value=1000,
                               data=b"", chain_id=CHAIN, priv=PRIV1)
    ds = devnet.encode_datastream(
        batch_number=7, chain_id=CHAIN, fork_id=9,
        coinbase=devnet.address_of(PRIV2),
        blocks=[{"block_number": 1, "timestamp": 100,
                 "delta_timestamp": 100, "l1_info_tree_index": 0,
                 "txs": [tx]}])
    batch = datastream2batch(ds)
    assert (batch.batch_number, batch.fork_id, batch.chain_id) == \
        (7, 9, CHAIN)
    assert batch.total_txs() == 1
    assert batch.blocks[0].txs[0].encoded_tx == tx
    l2 = batch_to_l2_data(batch)
    assert l2[0] == 0x0B


@pytest.mark.skipif(not os.path.exists(REF_ROM),
                    reason="reference ROM absent")
def test_synthetic_stateless_batch_executes(genesis):
    """The full stateless path over synthetic artifacts: the fork_9 ROM
    transfers value, charges gas to the sender, credits the coinbase and
    bumps the nonce."""
    from xlayer_prover_tpu.executor import rom_functions as rf
    from xlayer_prover_tpu.executor.executor import Executor
    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.state.hashdb import HashDB
    from xlayer_prover_tpu.state.keys import balance_key, nonce_key
    from xlayer_prover_tpu.state.smt import Smt

    a1, a2, g = genesis
    wres = witness2db(devnet.encode_witness(g))
    gas_price, value = 10 ** 9, 1000
    tx = devnet.sign_legacy_tx(nonce=0, gas_price=gas_price, gas=21000,
                               to=a2, value=value, data=b"",
                               chain_id=CHAIN, priv=PRIV1)
    batch = datastream2batch(devnet.encode_datastream(
        batch_number=1, chain_id=CHAIN, fork_id=9, coinbase=a2,
        blocks=[{"block_number": 1, "timestamp": 100,
                 "delta_timestamp": 100, "l1_info_tree_index": 0,
                 "txs": [tx]}]))
    inp = BatchInput(old_state_root=wres.state_root, chain_id=CHAIN,
                     fork_id=9, batch_l2_data=batch_to_l2_data(batch),
                     sequencer_addr=a2, timestamp_limit=200)
    inp.db_raw = dict(wres.db)
    inp.programs_raw = dict(wres.programs)

    rom = Rom.load(REF_ROM)
    ex = Executor(rom, n_bits=16, max_steps=1 << 15)
    rf.register_all(ex.main)
    hashdb = HashDB()
    inp.load_db(hashdb)
    res = ex.execute(hashdb, batch_uuid="devnet",
                     input_vars=inp.input_vars(),
                     setup_registers=inp.setup_registers)
    new_root = 0
    for i, limb in enumerate(res.ctx.regs.SR):
        new_root |= int(limb) << (32 * i)
    assert new_root != wres.state_root

    smt = Smt(hashdb.batches["devnet"])
    root4 = tuple((new_root >> (64 * i)) & ((1 << 64) - 1)
                  for i in range(4))
    gas_cost = 21000 * gas_price
    assert smt.get(root4, balance_key(a1)).value == \
        10 ** 18 - value - gas_cost
    # a2 is also the coinbase: value + fees on top of its 5 wei
    assert smt.get(root4, balance_key(a2)).value == 5 + value + gas_cost
    assert smt.get(root4, nonce_key(a1)).value == 1
