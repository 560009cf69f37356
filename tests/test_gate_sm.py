"""Gate-circuit AIR (KeccakF/Sha256F SM core): trace checks + proof
round trip on a tiny circuit, plus a full KeccakF slot trace check.

Mirrors the reference KeccakF SM tests' intent (keccak_f_executor.cpp:
executor fills pols, PIL checks gate semantics + ConnA/B/C wiring):
  * chunked bitwise plookup enforces per-row XOR/ANDP semantics;
  * the PlonK-style connection argument enforces the wire routing —
    tampering a wire value consistently with the gate table still fails.
"""

import numpy as np
import pytest

from xlayer_prover_tpu.models.zkevm import gate_sm, keccak_gates
from xlayer_prover_tpu.models.zkevm.gates import (GateBuilder, execute,
                                                  execute_all_wires_np,
                                                  levelize)
from xlayer_prover_tpu.stark import prover, verifier
from xlayer_prover_tpu.stark.air import AirBuilder

from tools.check_trace import check_trace


def _tiny_script():
    """5-gate circuit: out = andp(xor(i0,i1), xor(i1, andp(i0, i2)))."""
    b = GateBuilder(3)
    i0, i1, i2 = b.input_wire(0), b.input_wire(1), b.input_wire(2)
    t0 = b.xor(i0, i1)
    t1 = b.andp(i0, i2)
    t2 = b.xor(i1, t1)
    t3 = b.andp(t0, t2)
    t4 = b.xor(t3, i0)
    return levelize(b, [t3, t4])


def _build_tiny(n_bits=7, pack_bits=6, chunk_bits=2):
    script = _tiny_script()
    b = AirBuilder("gate", n_bits, n_queries=8, fri_fold_bits=3)
    layout = gate_sm.build(b, script, n_bits, pack_bits=pack_bits,
                           chunk_bits=chunk_bits, prefix="KF")
    air = b.compile()
    return air, layout


def _traces(air, layout, slot_inputs):
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    gate_sm.fill_fixed(layout, const_np)
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    outs = gate_sm.expand_into(layout, slot_inputs, cm1)
    return const_np, cm1, outs


def test_execute_all_wires_matches_levelized():
    script = _tiny_script()
    rng = np.random.default_rng(7)
    inp = rng.integers(0, 1 << 6, size=3, dtype=np.uint64)
    wires = execute_all_wires_np(script, inp, 6)
    ref = np.asarray(execute(script, inp[:, None].astype(np.uint32)))
    np.testing.assert_array_equal(wires[script.outputs],
                                  ref[:, 0].astype(np.uint64) & np.uint64(63))
    # semantic spot check at pack_bits=6
    mask = np.uint64(63)
    i0, i1, i2 = int(inp[0]), int(inp[1]), int(inp[2])
    t3 = (~(i0 ^ i1)) & (i1 ^ ((~i0) & i2)) & int(mask)
    assert int(wires[script.outputs[0]]) == t3


def test_tiny_gate_trace_checks():
    air, layout = _build_tiny()
    rng = np.random.default_rng(11)
    slots = [rng.integers(0, 64, size=3, dtype=np.uint64)
             for _ in range(min(3, layout.n_slots))]
    const_np, cm1, outs = _traces(air, layout, slots)
    assert check_trace(air, const_np, cm1, []) == []
    # outputs reported by the expander match direct evaluation
    for s, inp in enumerate(slots):
        wires = execute_all_wires_np(layout.script, inp, layout.pack_bits)
        np.testing.assert_array_equal(outs[s],
                                      wires[layout.script.outputs])


def test_tampered_gate_result_fails_lookup():
    air, layout = _build_tiny()
    const_np, cm1, _ = _traces(air, layout,
                               [np.asarray([5, 9, 33], dtype=np.uint64)])
    r0 = layout.slot_row0(0)
    col = layout.witness["c0"].index
    cm1[r0, col] ^= np.uint64(1)
    failures = check_trace(air, const_np, cm1, [])
    assert any("plookup" in f for f in failures)


def test_tampered_wire_copy_fails_connection():
    """Forge a gate row consistently with the bitwise table (so every
    lookup passes) but diverging from the routed wire value — only the
    connection argument can catch this."""
    air, layout = _build_tiny()
    const_np, cm1, _ = _traces(air, layout,
                               [np.asarray([5, 9, 33], dtype=np.uint64)])
    # gate 2 (xor i1 t1): bump its a-operand and recompute c = a ^ b
    r = layout.slot_row0(0) + 2
    w = layout.witness
    for k in range(layout.n_chunks):
        a = int(cm1[r, w[f"a{k}"].index]) ^ 1
        bv = int(cm1[r, w[f"b{k}"].index])
        cm1[r, w[f"a{k}"].index] = a
        cm1[r, w[f"c{k}"].index] = a ^ bv
    failures = check_trace(air, const_np, cm1, [])
    assert failures and all("connection" in f for f in failures)


@pytest.mark.slow
def test_tiny_gate_proof_roundtrip():
    air, layout = _build_tiny()
    rng = np.random.default_rng(3)
    slots = [rng.integers(0, 64, size=3, dtype=np.uint64)]
    const_np, cm1, _ = _traces(air, layout, slots)
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1, [])
    assert verifier.verify(air, setup.verkey, proof)
    # tamper: consistent-with-table wire forge must fail the proof
    bad = cm1.copy()
    r = layout.slot_row0(0) + 2
    w = layout.witness
    for k in range(layout.n_chunks):
        a = int(bad[r, w[f"a{k}"].index]) ^ 1
        bv = int(bad[r, w[f"b{k}"].index])
        bad[r, w[f"a{k}"].index] = a
        bad[r, w[f"c{k}"].index] = a ^ bv
    proof = prover.gen_proof(setup, bad, [])
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)


@pytest.mark.slow
def test_keccak_slot_trace_checks():
    """One full KeccakF permutation slot (153,686 gates) at 2^18 with
    48-bit packing in 6x8-bit chunks; validates the production geometry
    (reference: 44 bits as 4x11 chunks vs 2^23 domain,
    keccak_f_executor.cpp:154)."""
    script = keccak_gates.build_script()
    n_bits = 18
    b = AirBuilder("keccakf", n_bits, n_queries=4, fri_fold_bits=3)
    layout = gate_sm.build(b, script, n_bits, pack_bits=48, chunk_bits=8,
                           prefix="KF")
    air = b.compile()
    assert layout.n_slots >= 1
    rng = np.random.default_rng(5)
    inp = rng.integers(0, 1 << 48, size=script.n_inputs, dtype=np.uint64)
    const_np = np.zeros((air.n, air.const_width), dtype=np.uint64)
    gate_sm.fill_fixed(layout, const_np)
    cm1 = np.zeros((air.n, air.cm1_width), dtype=np.uint64)
    outs = gate_sm.expand_into(layout, [inp], cm1)
    assert check_trace(air, const_np, cm1, []) == []
    # output equals 48 interleaved keccak-f permutations
    wires = execute_all_wires_np(script, inp, 48)
    np.testing.assert_array_equal(outs[0], wires[script.outputs])
