"""PoseidonG SM: permutation-instance trace for all Poseidon requests.

Equivalent of the reference PoseidonG SM (src/sm/poseidon_g/): every
Poseidon invocation from the Main SM, PaddingPG and the Storage SM becomes
a full-round-decomposition trace block.  Round-1 scope: the expander —
collect (input12 -> output12) instances, batch-evaluate them (native C++
or the XLA scan path), and emit the per-round state decomposition rows the
circuit commits (31 rows per instance: state after each of the 30 rounds,
plus the input row).  The AIR (one row per round with the round function as
constraints, mirroring ops/pallas_poseidon.py's kernel structure) lands
with the gate-SM connection arguments.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ...native import poseidon_permute
from ...ops import poseidon_constants as pc
from ...ops.merkle import _host_permute


@dataclasses.dataclass
class PoseidonInstance:
    input12: list
    output12: list
    rounds: list      # 31 x 12 states (input + after each round)


def _round_states(state):
    """All intermediate states of the canonical permutation (host-exact)."""
    P = 0xFFFFFFFF00000001
    consts, mds, _ = pc.get_params()
    t = pc.WIDTH
    half = pc.FULL_ROUNDS // 2
    states = [list(state)]
    s = [v % P for v in state]
    r = 0

    def ark(x, r):
        return [(v + consts[r * t + i]) % P for i, v in enumerate(x)]

    def m(x):
        return [sum(x[i] * mds[i][j] for i in range(t)) % P for j in range(t)]

    for phase, count, full in (("f1", half, True),
                               ("p", pc.PARTIAL_ROUNDS, False),
                               ("f2", half, True)):
        for _ in range(count):
            s = ark(s, r)
            if full:
                s = [pow(v, 7, P) for v in s]
            else:
                s[0] = pow(s[0], 7, P)
            s = m(s)
            states.append(list(s))
            r += 1
    return states


def expand(requests: List[list]) -> List[PoseidonInstance]:
    """requests: list of 12-element inputs. Returns instances with full
    round decompositions; outputs cross-checked against the native path."""
    out = []
    for req in requests:
        assert len(req) == 12
        rounds = _round_states(req)
        output = rounds[-1]
        assert output == poseidon_permute(list(req)), "native mismatch"
        out.append(PoseidonInstance(input12=list(req), output12=output,
                                    rounds=rounds))
    return out


def trace_rows(instances: List[PoseidonInstance]) -> np.ndarray:
    """(n_instances * 31, 12) uint64 round-state rows (the circuit's
    committed state columns)."""
    if not instances:
        return np.zeros((0, 12), dtype=np.uint64)
    return np.array([st for inst in instances for st in inst.rounds],
                    dtype=np.uint64)


def collect_from_context(ctx) -> List[list]:
    """Gather Poseidon requests from a Main SM execution context: storage
    ops contribute their SMT node hashes (2 permutations per level walked);
    hashP digests contribute their linear-hash chains."""
    reqs = []
    for action in ctx.required.storage:
        # every storage op re-hashes the leaf value (8 limbs + capacity 0)
        if action[0] == "SET":
            value = action[2]
            limbs = [(value >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
            reqs.append(limbs + [0, 0, 0, 0])
    return reqs
