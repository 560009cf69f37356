"""Gate-circuit Keccak-f vs the direct implementation (bit-exact)."""

import numpy as np

from xlayer_prover_tpu.models.zkevm import gates, keccak_gates
from xlayer_prover_tpu.ops.keccak import _host_keccak_f


def test_simple_gate_circuit():
    b = gates.GateBuilder(n_inputs=3)
    i0, i1, i2 = b.input_wire(0), b.input_wire(1), b.input_wire(2)
    # out = i0 ^ ((~i1) & i2)
    out = b.xor(i0, b.andp(i1, i2))
    script = gates.levelize(b, [out])
    inp = np.array([[0b1100], [0b1010], [0b0110]], dtype=np.uint32)
    res = np.asarray(gates.execute(script, inp))
    exp = inp[0] ^ ((~inp[1]) & inp[2])
    assert res[0, 0] == exp[0]


def test_keccak_gate_script_matches_direct(rng):
    script = keccak_gates.build_script()
    assert script.n_gates > 50000
    assert script.depth < 400
    batch = 3
    states = rng.integers(0, 1 << 64, size=(batch, 25), dtype=np.uint64)
    packed = keccak_gates.pack_states(states)
    out_bits = gates.execute(script, packed)
    got = keccak_gates.unpack_states(np.asarray(out_bits), batch)
    for i in range(batch):
        exp = _host_keccak_f([int(v) for v in states[i]])
        assert [int(v) for v in got[i]] == exp, i
