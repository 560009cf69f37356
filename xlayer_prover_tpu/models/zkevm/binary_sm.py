"""Binary SM: provable 256-bit bitwise/add/sub circuit + trace expander.

Equivalent of the reference Binary SM (src/sm/binary/binary_executor.cpp:
each 256-bit op is chunk-decomposed over a fixed number of rows with
FACTOR/RESET constant tables recomposing the 8 x 32-bit register limbs, and
per-chunk semantics verified against a lookup table).  Here the circuit is
authored in the AIR framework and proven by the TPU STARK engine:

  * each op occupies ``rows_per_op`` rows of ``chunk_bits``-bit chunks
    (little-endian);
  * accumulator recurrence per 32-bit limb j:
      acc_j' = acc_j * (1 - RESET') + chunk' * FACTOR_j'
  * carry chain: c_in' = c_out * (1 - RESET')
  * opcode held constant within an op;
  * chunk semantics via a 6-tuple plookup
      (opcode, a_chunk, b_chunk, c_in, c_chunk, c_out) ∈ T
    with T enumerated in fixed columns (ADD=0, SUB=1, AND=5, OR=6, XOR=7).

The trace expander vectorizes over actions x chunks with numpy (device fill
is a later optimization; the prover consumes numpy columns anyway).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...stark.air import AirBuilder, Col, Const

OPCODES = {"ADD": 0, "SUB": 1, "AND": 5, "OR": 6, "XOR": 7}


@dataclasses.dataclass
class BinaryLayout:
    chunk_bits: int
    rows_per_op: int
    fixed: dict     # name -> Col
    witness: dict   # name -> Col


def chunk_table(chunk_bits: int):
    """Enumerate T rows: (op, a, b, cin, c, cout)."""
    m = 1 << chunk_bits
    rows = []
    for a in range(m):
        for b in range(m):
            for cin in (0, 1):
                s = a + b + cin
                rows.append((OPCODES["ADD"], a, b, cin, s % m, s // m))
                d = a - b - cin
                rows.append((OPCODES["SUB"], a, b, cin, d % m, int(d < 0)))
            rows.append((OPCODES["AND"], a, b, 0, a & b, 0))
            rows.append((OPCODES["OR"], a, b, 0, a | b, 0))
            rows.append((OPCODES["XOR"], a, b, 0, a ^ b, 0))
    return rows


def build(builder: AirBuilder, n_bits: int, chunk_bits: int = 4) -> BinaryLayout:
    """Add the Binary SM columns + constraints to a (possibly shared) builder."""
    rows_per_op = 256 // chunk_bits
    chunks_per_limb = 32 // chunk_bits

    fixed = {}
    witness = {}
    fixed["RESET"] = builder.fixed("BIN_RESET")
    fixed["LAST"] = builder.fixed("BIN_LAST")
    for j in range(8):
        fixed[f"FACTOR{j}"] = builder.fixed(f"BIN_FACTOR{j}")
    for name in ("T_OP", "T_A", "T_B", "T_CIN", "T_C", "T_COUT"):
        fixed[name] = builder.fixed(f"BIN_{name}")

    witness["op"] = builder.witness("bin_op")
    for v in ("a", "b", "c"):
        witness[f"{v}_chunk"] = builder.witness(f"bin_{v}_chunk")
    witness["c_in"] = builder.witness("bin_c_in")
    witness["c_out"] = builder.witness("bin_c_out")
    for v in ("a", "b", "c"):
        for j in range(8):
            witness[f"{v}{j}"] = builder.witness(f"bin_{v}{j}")

    reset_p = fixed["RESET"].shifted()
    one = Const(1)
    for v in ("a", "b", "c"):
        ch = witness[f"{v}_chunk"]
        for j in range(8):
            acc = witness[f"{v}{j}"]
            builder.constrain(acc.shifted()
                              - acc * (one - reset_p)
                              - ch.shifted() * fixed[f"FACTOR{j}"].shifted())
    cin, cout = witness["c_in"], witness["c_out"]
    builder.constrain(cin.shifted() - cout * (one - reset_p))
    opc = witness["op"]
    builder.constrain((opc.shifted() - opc) * (one - reset_p))
    builder.constrain(fixed["RESET"] * cin)  # carry starts at 0

    builder.plookup(
        [opc, witness["a_chunk"], witness["b_chunk"], cin,
         witness["c_chunk"], cout],
        [fixed["T_OP"], fixed["T_A"], fixed["T_B"], fixed["T_CIN"],
         fixed["T_C"], fixed["T_COUT"]],
    )
    return BinaryLayout(chunk_bits=chunk_bits, rows_per_op=rows_per_op,
                        fixed=fixed, witness=witness)


def fill_fixed(layout: BinaryLayout, const_np: np.ndarray):
    """Fill the fixed columns (RESET/FACTOR/table) for N rows."""
    n = const_np.shape[0]
    rpo = layout.rows_per_op
    cb = layout.chunk_bits
    cpl = 32 // cb  # chunks per 32-bit limb
    idx = np.arange(n)
    const_np[:, layout.fixed["RESET"].index] = (idx % rpo == 0)
    const_np[:, layout.fixed["LAST"].index] = (idx % rpo == rpo - 1)
    pos = idx % rpo
    limb = pos // cpl
    within = pos % cpl
    for j in range(8):
        f = np.where(limb == j, (1 << (cb * within)), 0)
        const_np[:, layout.fixed[f"FACTOR{j}"].index] = f
    table = chunk_table(cb)
    assert len(table) <= n, f"table ({len(table)}) larger than domain ({n})"
    cols = ["T_OP", "T_A", "T_B", "T_CIN", "T_C", "T_COUT"]
    arr = np.zeros((n, 6), dtype=np.uint64)
    arr[:len(table)] = np.array(table, dtype=np.uint64)
    # pad with the all-zero ADD row (0,0,0,0,0,0) which is a valid entry
    for k, name in enumerate(cols):
        const_np[:, layout.fixed[name].index] = arr[:, k]


def expand_trace(layout: BinaryLayout, actions, cm1_np: np.ndarray):
    """actions: list of (opcode, a, b) with 256-bit a,b.  Fills cm1 columns
    and returns the list of (result, carry_out) per action."""
    n = cm1_np.shape[0]
    rpo = layout.rows_per_op
    cb = layout.chunk_bits
    m = (1 << cb) - 1
    assert len(actions) * rpo <= n, "too many binary actions for the domain"
    results = []
    w = layout.witness
    for k, (opname, a, b) in enumerate(actions):
        opcode = OPCODES[opname]
        base = k * rpo
        acc = {"a": 0, "b": 0, "c": 0}
        cin = 0
        c_val = 0
        for r in range(rpo):
            a_ch = (a >> (cb * r)) & m
            b_ch = (b >> (cb * r)) & m
            if opname == "ADD":
                s = a_ch + b_ch + cin
                c_ch, cout = s & m, s >> cb
            elif opname == "SUB":
                d = a_ch - b_ch - cin
                c_ch, cout = d & m, int(d < 0)
            else:
                c_ch = (a_ch & b_ch) if opname == "AND" else \
                    (a_ch | b_ch) if opname == "OR" else (a_ch ^ b_ch)
                cout = 0
            row = base + r
            cm1_np[row, w["op"].index] = opcode
            cm1_np[row, w["a_chunk"].index] = a_ch
            cm1_np[row, w["b_chunk"].index] = b_ch
            cm1_np[row, w["c_chunk"].index] = c_ch
            cm1_np[row, w["c_in"].index] = cin
            cm1_np[row, w["c_out"].index] = cout
            c_val |= c_ch << (cb * r)
            cin = cout
            for vname, val in (("a", a), ("b", b), ("c", c_val)):
                for j in range(8):
                    limb_acc = (val >> (32 * j)) & 0xFFFFFFFF
                    # mask to chunks written so far within this limb
                    cpl = 32 // cb
                    limb_idx = r // cpl
                    if j < limb_idx:
                        pass  # full limb already accumulated
                    elif j == limb_idx:
                        written = (r % cpl) + 1
                        limb_acc &= (1 << (cb * written)) - 1
                    else:
                        limb_acc = 0
                    cm1_np[base + r, w[f"{vname}{j}"].index] = limb_acc
        results.append((c_val, cin))
    # remaining rows: all-zero ADD ops (valid table rows, acc stays 0)
    return results
