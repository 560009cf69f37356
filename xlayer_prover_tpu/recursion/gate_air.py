"""The compression AIR: 12-wire PlonK-ish rows proving a traced gate
circuit (recursion/circuit.py) with the STARK engine.

Equivalent of the reference's c12a/recursive compression circuits
("compression, 12 wires": the circom verifier circuits are laid out on
12-wire rows with copy constraints and a Poseidon custom gate, then proven
by Starks::genProof — prover.cpp:591-645, starkInfo c12a).  Row forms:

  * arith rows: four 3-wire gates (w[3s], w[3s+1], w[3s+2]) with per-slot
    coefficient columns: qM*a*b + qL*a + qR*b + qO*c + qC = 0;
  * Poseidon rows: 31-row blocks; row r holds the permutation state before
    round r in w0..11; committed S-box ladder columns (t2 = s^2, t4 =
    t2^2, t6 = t4*t2, sb = s or s*t6) keep every constraint at degree <=
    3; the official round schedule matches ops/poseidon_gl.py;
  * public rows: the first rows pin circuit publics to wire cells;
  * copy constraints: one wide connection argument over w0..11 with
    sigma columns (im-chain committed products keep degree <= 3).

The same blowup-2 geometry serves recursive1/recursive2/recursiveF —
circuits differ only in their gate programs (verifier_circuit.py).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..fields import gl, glh
from ..ops import poseidon_constants as pc
from ..stark.air import AirBuilder, Col, Const
from .circuit import Gate, HintOp, PoseidonOp, Tracer

P = gl.P
N_WIRES = 12
GATES_PER_ROW = 4
POS_ROWS = 31          # 30 rounds + output row


@dataclasses.dataclass
class GateLayout:
    tracer: Tracer
    n_bits: int
    n_pub_rows: int
    pos_blocks: List[PoseidonOp]
    pos_row0: int
    arith_gates: List[Gate]
    arith_row0: int
    n_rows_used: int
    fixed: dict
    witness: dict
    wire_cells: dict       # wire -> [(row, col)]
    k_coeffs: list


def plan(tracer: Tracer, n_bits: int | None = None) -> dict:
    """Row plan: publics first, then Poseidon blocks, then arith rows."""
    n_pub_rows = -(-len(tracer.public_wires) // N_WIRES) \
        if tracer.public_wires else 0
    pos_ops = [op for op in tracer.ops if isinstance(op, PoseidonOp)]
    gates = [op for op in tracer.ops if isinstance(op, Gate)]
    pos_row0 = n_pub_rows
    arith_row0 = pos_row0 + POS_ROWS * len(pos_ops)
    n_arith_rows = -(-len(gates) // GATES_PER_ROW)
    used = arith_row0 + n_arith_rows
    need_bits = max(4, (used + 1 - 1).bit_length())
    if n_bits is None:
        n_bits = need_bits
    assert used < (1 << n_bits), \
        f"circuit needs {used} rows > domain 2^{n_bits}"
    return {"n_pub_rows": n_pub_rows, "pos_ops": pos_ops, "gates": gates,
            "pos_row0": pos_row0, "arith_row0": arith_row0, "used": used,
            "n_bits": n_bits}


def build(tracer: Tracer, n_bits: int | None = None, n_queries: int = 8,
          fri_fold_bits: int = 3):
    pl = plan(tracer, n_bits)
    n_bits = pl["n_bits"]
    b = AirBuilder("recursion-gates", n_bits, n_queries=n_queries,
                   fri_fold_bits=fri_fold_bits)

    fixed = {}
    witness = {}
    for j in range(N_WIRES):
        witness[f"w{j}"] = b.witness(f"gw{j}")
    for name in ("t2", "t4", "t6", "sb"):
        for j in range(N_WIRES):
            witness[f"{name}{j}"] = b.witness(f"g{name}{j}")
    for s in range(GATES_PER_ROW):
        for q in ("qM", "qL", "qR", "qO", "qC"):
            fixed[f"{q}{s}"] = b.fixed(f"G_{q}{s}")
    fixed["POSROW"] = b.fixed("G_POSROW")
    fixed["FULLROW"] = b.fixed("G_FULLROW")
    for j in range(N_WIRES):
        fixed[f"PC{j}"] = b.fixed(f"G_PC{j}")
    for j in range(N_WIRES):
        fixed[f"SIG{j}"] = b.fixed(f"G_SIG{j}")
    for r in range(pl["n_pub_rows"]):
        fixed[f"PUBROW{r}"] = b.fixed(f"G_PUBROW{r}")

    one = Const(1)

    # ---- arith gates ---------------------------------------------------
    for s in range(GATES_PER_ROW):
        wa = witness[f"w{3 * s}"]
        wb = witness[f"w{3 * s + 1}"]
        wc = witness[f"w{3 * s + 2}"]
        b.constrain(fixed[f"qM{s}"] * wa * wb + fixed[f"qL{s}"] * wa
                    + fixed[f"qR{s}"] * wb + fixed[f"qO{s}"] * wc
                    + fixed[f"qC{s}"])

    # ---- Poseidon S-box ladder (all rows; s_k = w_k + PC_k) ------------
    consts, mds, _ = pc.get_params()
    for j in range(N_WIRES):
        s_j = witness[f"w{j}"] + fixed[f"PC{j}"]
        t2, t4, t6 = witness[f"t2{j}"], witness[f"t4{j}"], witness[f"t6{j}"]
        sb = witness[f"sb{j}"]
        b.constrain(t2 - s_j * s_j)
        b.constrain(t4 - t2 * t2)
        b.constrain(t6 - t4 * t2)
        if j == 0:
            b.constrain(sb - s_j * t6)
        else:
            b.constrain(sb - fixed["FULLROW"] * s_j * t6
                        - (one - fixed["FULLROW"]) * s_j)

    # ---- Poseidon round transition (out_j = sum_i mds[i][j] * sb_i) ----
    for j in range(N_WIRES):
        acc = None
        for i in range(N_WIRES):
            term = witness[f"sb{i}"] * Const(mds[i][j])
            acc = term if acc is None else acc + term
        b.constrain(fixed["POSROW"]
                    * (witness[f"w{j}"].shifted() - acc))

    # ---- publics -------------------------------------------------------
    publics = []
    for i, wire in enumerate(tracer.public_wires):
        p = b.public_value()
        publics.append(p)
        r, c = divmod(i, N_WIRES)
        b.constrain(fixed[f"PUBROW{r}"] * (witness[f"w{c}"] - p))

    # ---- copy constraints ----------------------------------------------
    k_coeffs = [pow(7, j, P) for j in range(N_WIRES)]
    b.connection([witness[f"w{j}"] for j in range(N_WIRES)],
                 [fixed[f"SIG{j}"] for j in range(N_WIRES)],
                 k_coeffs)

    air = b.compile()

    # ---- wire -> cells map ---------------------------------------------
    wire_cells = {}

    def add_cell(wire, row, col):
        wire_cells.setdefault(wire, []).append((row, col))

    for i, wire in enumerate(tracer.public_wires):
        r, c = divmod(i, N_WIRES)
        add_cell(wire, r, c)
    for bi, op in enumerate(pl["pos_ops"]):
        r0 = pl["pos_row0"] + bi * POS_ROWS
        for k in range(N_WIRES):
            add_cell(op.inputs[k], r0, k)
            add_cell(op.outputs[k], r0 + 30, k)
    for gi, g in enumerate(pl["gates"]):
        row = pl["arith_row0"] + gi // GATES_PER_ROW
        slot = gi % GATES_PER_ROW
        add_cell(g.a, row, 3 * slot)
        add_cell(g.b, row, 3 * slot + 1)
        if g.c is not None:
            add_cell(g.c, row, 3 * slot + 2)

    layout = GateLayout(
        tracer=tracer, n_bits=n_bits, n_pub_rows=pl["n_pub_rows"],
        pos_blocks=pl["pos_ops"], pos_row0=pl["pos_row0"],
        arith_gates=pl["gates"], arith_row0=pl["arith_row0"],
        n_rows_used=pl["used"], fixed=fixed, witness=witness,
        wire_cells=wire_cells, k_coeffs=k_coeffs)
    return air, layout


def fill_fixed(layout: GateLayout, const_np: np.ndarray):
    n = const_np.shape[0]
    fx = layout.fixed
    consts, mds, _ = pc.get_params()

    # gate coefficients
    for gi, g in enumerate(layout.arith_gates):
        row = layout.arith_row0 + gi // GATES_PER_ROW
        s = gi % GATES_PER_ROW
        const_np[row, fx[f"qM{s}"].index] = g.qM % P
        const_np[row, fx[f"qL{s}"].index] = g.qL % P
        const_np[row, fx[f"qR{s}"].index] = g.qR % P
        const_np[row, fx[f"qO{s}"].index] = g.qO % P
        const_np[row, fx[f"qC{s}"].index] = g.qC % P

    # poseidon rows
    for bi in range(len(layout.pos_blocks)):
        r0 = layout.pos_row0 + bi * POS_ROWS
        for r in range(30):
            const_np[r0 + r, fx["POSROW"].index] = 1
            if r < 4 or r >= 26:
                const_np[r0 + r, fx["FULLROW"].index] = 1
            for j in range(N_WIRES):
                const_np[r0 + r, fx[f"PC{j}"].index] = consts[r * 12 + j]

    # publics rows
    for r in range(layout.n_pub_rows):
        const_np[r, fx[f"PUBROW{r}"].index] = 1

    # sigma: cycles through each wire's cells; untouched cells self-map
    x = np.empty(n, dtype=np.uint64)
    cur = 1
    w = gl.host_w(layout.n_bits)
    for i in range(n):
        x[i] = cur
        cur = (cur * w) % P
    for j in range(N_WIRES):
        const_np[:, fx[f"SIG{j}"].index] = \
            glh.mul(x, np.uint64(layout.k_coeffs[j]))
    for cells in layout.wire_cells.values():
        if len(cells) < 2:
            continue
        for idx, (row, col) in enumerate(cells):
            nrow, ncol = cells[(idx + 1) % len(cells)]
            const_np[row, fx[f"SIG{col}"].index] = \
                int(x[nrow]) * layout.k_coeffs[ncol] % P


def fill_witness(layout: GateLayout, input_values, cm1_np: np.ndarray):
    """Execute the circuit and lay wire values + aux columns out on rows."""
    from ..native import poseidon_permute
    n = cm1_np.shape[0]
    wt = layout.witness
    fxv = None
    vals = layout.tracer.run(input_values)

    wcols = np.zeros((n, N_WIRES), dtype=np.uint64)
    for wire, cells in layout.wire_cells.items():
        v = vals[wire]
        for (row, col) in cells:
            wcols[row, col] = v
    # poseidon internal state rows
    consts, mds, _ = pc.get_params()
    for bi, op in enumerate(layout.pos_blocks):
        r0 = layout.pos_row0 + bi * POS_ROWS
        state = [vals[wi] for wi in op.inputs]
        wcols[r0] = state
        for r in range(30):
            s = [(state[k] + consts[r * 12 + k]) % P for k in range(12)]
            if r < 4 or r >= 26:
                s = [pow(v, 7, P) for v in s]
            else:
                s[0] = pow(s[0], 7, P)
            state = [sum(mds[i][j] * s[i] for i in range(12)) % P
                     for j in range(12)]
            wcols[r0 + r + 1] = state
        expect = [vals[wi] for wi in op.outputs]
        assert state == expect, "poseidon block mismatch"

    for j in range(N_WIRES):
        cm1_np[:, wt[f"w{j}"].index] = wcols[:, j]

    # aux S-box ladder columns for every row (vectorized)
    pc_cols = np.zeros((n, N_WIRES), dtype=np.uint64)
    fullrow = np.zeros(n, dtype=np.uint64)
    for bi in range(len(layout.pos_blocks)):
        r0 = layout.pos_row0 + bi * POS_ROWS
        for r in range(30):
            for j in range(N_WIRES):
                pc_cols[r0 + r, j] = consts[r * 12 + j]
            if r < 4 or r >= 26:
                fullrow[r0 + r] = 1
    for j in range(N_WIRES):
        s = glh.add(wcols[:, j], pc_cols[:, j])
        t2 = glh.mul(s, s)
        t4 = glh.mul(t2, t2)
        t6 = glh.mul(t4, t2)
        st6 = glh.mul(s, t6)
        if j == 0:
            sb = st6
        else:
            sb = np.where(fullrow == 1, st6, s)
        cm1_np[:, wt[f"t2{j}"].index] = t2
        cm1_np[:, wt[f"t4{j}"].index] = t4
        cm1_np[:, wt[f"t6{j}"].index] = t6
        cm1_np[:, wt[f"sb{j}"].index] = sb
    return vals


def publics_of(layout: GateLayout, vals) -> list:
    return [vals[w] for w in layout.tracer.public_wires]
