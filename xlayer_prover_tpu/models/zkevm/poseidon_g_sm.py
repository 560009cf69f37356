"""PoseidonG SM: provable permutation-instance circuit + trace expander.

Equivalent of the reference PoseidonG SM (src/sm/poseidon_g/
poseidon_g_executor.cpp): every Poseidon invocation becomes a 31-row block
(input state + state after each of the 30 rounds) whose round function is
enforced by constraints: with committed S-box ladder columns
t2 = s^2, t4 = t2^2, t6 = t4*t2 (s = state + round constant), the
x^7 S-box is s*t6 and the MDS multiply keeps every constraint at
degree <= 4 — the same ladder the recursion gate AIR uses
(recursion/gate_air.py).  The expander fills blocks from the executor's
recorded Poseidon requests (storage key derivations + SMT value hashes,
Required.poseidon) and cross-checks against the native permutation.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ...native import poseidon_permute
from ...ops import poseidon_constants as pc
from ...ops.merkle import _host_permute
from ...stark.air import AirBuilder, Const

ROWS_PER_PERM = 31


@dataclasses.dataclass
class PoseidonGLayout:
    fixed: dict
    witness: dict


def build(builder: AirBuilder, n_bits: int) -> PoseidonGLayout:
    """Add the PoseidonG column group + round constraints to the AIR."""
    consts, mds, _ = pc.get_params()
    fixed = {"PROW": builder.fixed("PG_PROW"),
             "PFULL": builder.fixed("PG_PFULL"),
             "PFIRST": builder.fixed("PG_PFIRST")}
    for j in range(12):
        fixed[f"PC{j}"] = builder.fixed(f"PG_PC{j}")
    w = {}
    for j in range(12):
        w[f"ps{j}"] = builder.witness(f"pg_ps{j}")
    for name in ("t2", "t4", "t6"):
        for j in range(12):
            w[f"{name}{j}"] = builder.witness(f"pg_{name}{j}")

    one = Const(1)
    sbx = {}
    for j in range(12):
        s_j = w[f"ps{j}"] + fixed[f"PC{j}"]
        builder.constrain(w[f"t2{j}"] - s_j * s_j)
        builder.constrain(w[f"t4{j}"] - w[f"t2{j}"] * w[f"t2{j}"])
        builder.constrain(w[f"t6{j}"] - w[f"t4{j}"] * w[f"t2{j}"])
        st6 = s_j * w[f"t6{j}"]
        if j == 0:
            sbx[j] = st6
        else:
            sbx[j] = fixed["PFULL"] * st6 + (one - fixed["PFULL"]) * s_j
    for j in range(12):
        acc = None
        for k in range(12):
            term = sbx[k] * Const(mds[k][j])
            acc = term if acc is None else acc + term
        builder.constrain(fixed["PROW"] * (w[f"ps{j}"].shifted() - acc))
    return PoseidonGLayout(fixed=fixed, witness=w)


def fill_fixed(layout: PoseidonGLayout, const_np: np.ndarray):
    n = const_np.shape[0]
    consts, _, _ = pc.get_params()
    n_blocks = n // ROWS_PER_PERM
    for b in range(n_blocks):
        r0 = b * ROWS_PER_PERM
        const_np[r0, layout.fixed["PFIRST"].index] = 1
        for r in range(30):
            const_np[r0 + r, layout.fixed["PROW"].index] = 1
            if r < 4 or r >= 26:
                const_np[r0 + r, layout.fixed["PFULL"].index] = 1
            for j in range(12):
                const_np[r0 + r, layout.fixed[f"PC{j}"].index] =                     consts[r * 12 + j]


def expand_into(layout: PoseidonGLayout, requests: List[list],
                cm1_np: np.ndarray):
    """Fill committed columns from Poseidon requests; returns instances."""
    GLP = 0xFFFFFFFF00000001
    n = cm1_np.shape[0]
    assert len(requests) * ROWS_PER_PERM <= n, "too many poseidon requests"
    consts, _, _ = pc.get_params()
    instances = expand(requests)
    w = layout.witness
    # committed states; padding blocks replay the zero-input permutation
    # (the reference pads the same way, poseidon_g_executor.cpp:255-305)
    zero_rounds = _round_states([0] * 12)
    n_blocks = n // ROWS_PER_PERM
    for bi in range(n_blocks):
        r0 = bi * ROWS_PER_PERM
        rounds = instances[bi].rounds if bi < len(instances) else zero_rounds
        for r, state in enumerate(rounds):
            for j in range(12):
                cm1_np[r0 + r, w[f"ps{j}"].index] = state[j]
    # aux ladder on EVERY row (global constraints; PC = 0 on pad rows)
    pc_cols = np.zeros((n, 12), dtype=np.uint64)
    for b in range(n // ROWS_PER_PERM):
        r0 = b * ROWS_PER_PERM
        for r in range(30):
            for j in range(12):
                pc_cols[r0 + r, j] = consts[r * 12 + j]
    from ...fields import glh
    for j in range(12):
        s = glh.add(cm1_np[:, w[f"ps{j}"].index], pc_cols[:, j])
        t2 = glh.mul(s, s)
        t4 = glh.mul(t2, t2)
        t6 = glh.mul(t4, t2)
        cm1_np[:, w[f"t2{j}"].index] = t2
        cm1_np[:, w[f"t4{j}"].index] = t4
        cm1_np[:, w[f"t6{j}"].index] = t6
    return instances


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
        if action.is_set:
            value = action.set_result.new_value
            limbs = [(value >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
            reqs.append(limbs + [0, 0, 0, 0])
    return reqs
