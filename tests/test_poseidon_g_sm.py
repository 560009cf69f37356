"""PoseidonG SM expander: round decomposition consistency."""

import numpy as np

from xlayer_prover_tpu.models.zkevm import poseidon_g_sm
from xlayer_prover_tpu.ops.merkle import _host_permute


def test_round_decomposition(rng):
    req = [int(v) for v in rng.integers(0, 1 << 63, size=12, dtype=np.uint64)]
    insts = poseidon_g_sm.expand([req])
    inst = insts[0]
    assert len(inst.rounds) == 31
    assert inst.rounds[0] == req
    assert inst.output12 == _host_permute(req)


def test_trace_rows(rng):
    reqs = [[int(v) for v in rng.integers(0, 1 << 40, size=12,
                                          dtype=np.uint64)]
            for _ in range(3)]
    insts = poseidon_g_sm.expand(reqs)
    rows = poseidon_g_sm.trace_rows(insts)
    assert rows.shape == (3 * 31, 12)
    # block boundaries: each block starts with its request
    for k, req in enumerate(reqs):
        assert [int(v) for v in rows[31 * k]] == req
