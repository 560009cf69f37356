"""The zkEVM circuit: Main SM + Binary SM + Memory SM + Arith SM in ONE
AIR over a shared domain, with cross-SM arguments binding them.

This is the architecture of the reference's full zkevm STARK (751 committed
polynomials over one 2^23 domain, commit_pols.hpp:1735-1737; the Executor
fills per-SM column groups, executor.cpp:487-704; PIL lookups bind Main
rows to each secondary SM):

  * Main SM commits registers + ROM-bound instruction columns per step
    (models/zkevm/main_sm_air.py);
  * every Main `bin` row looks up (binOpcode, A, B, op, carry) among the
    Binary SM's completed ops;
  * every Main `arithEq0` row looks up (A, B, C, D, op) among the Arith
    SM's proven A*B + C = D*2^256 + op relations (the 32-bit tuple limbs
    recompose the Arith SM's 16-bit-limb rows through multi-row shifts);
  * Main memory rows bind to the Memory SM's sorted-access consistency
    argument by a selected permutation over (addr, step, wr, value).

Storage/hash/memAlign/EC-arith rows remain host-verified by the executor
in this round (see main_sm_air.py docstring for the scope statement).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...stark.air import AirBuilder
from . import arith_sm, binary_sm, main_sm_air, memory_sm, poseidon_g_sm


@dataclasses.dataclass
class ZkevmLayout:
    main: main_sm_air.MainLayout
    binary: binary_sm.BinaryLayout
    memory: memory_sm.MemoryLayout
    arith: arith_sm.ArithLayout
    poseidon: poseidon_g_sm.PoseidonGLayout


def build(rom, n_bits: int = 16, chunk_bits: int = 4, limb_bits: int = 16,
          n_queries: int = 8, start_label: str = "start",
          stop_label: str = "finalizeExecution"):
    b = AirBuilder("zkevm", n_bits, n_queries=n_queries, fri_fold_bits=3)
    main = main_sm_air.build(b, rom, n_bits, start_label, stop_label)
    binl = binary_sm.build(b, n_bits, chunk_bits)
    meml = memory_sm.build(b, n_bits)
    aril = arith_sm.build(b, 256, limb_bits)
    posl = poseidon_g_sm.build(b, n_bits)

    mw, mf = main.witness, main.fixed

    # ---- Main -> Binary ----------------------------------------------
    f_cols = [mw["binOpcode"]]
    t_cols = [binl.witness["op"]]
    for reg, v in (("A", "a"), ("B", "b")):
        f_cols += [mw[f"{reg}{j}"] for j in range(8)]
        t_cols += [binl.witness[f"{v}{j}"] for j in range(8)]
    f_cols += [mw[f"op{j}"] for j in range(8)] + [mw["binCarry"]]
    t_cols += [binl.witness[f"res{j}"] for j in range(8)] \
        + [binl.witness["c_out"]]
    b.plookup(f_cols, t_cols, f_sel=mw["bin"], t_sel=binl.fixed["LAST"])

    # ---- Main -> Arith (eq0) -----------------------------------------
    cp32 = 32 // aril.limb_bits      # arith limbs per 32-bit tuple limb
    f_cols = []
    t_cols = []
    for reg, acol in (("A", "a"), ("B", "b"), ("C", "c"), ("D", "d")):
        for j in range(8):
            f_cols.append(mw[f"{reg}{j}"])
            expr = None
            for k in range(cp32):
                limb = aril.witness[acol].shifted(j * cp32 + k) \
                    if (j * cp32 + k) else aril.witness[acol]
                term = limb * (1 << (aril.limb_bits * k))
                expr = term if expr is None else expr + term
            t_cols.append(expr)
    for j in range(8):
        f_cols.append(mw[f"op{j}"])
        expr = None
        for k in range(cp32):
            sh = j * cp32 + k
            limb = aril.witness["e"].shifted(sh) if sh else aril.witness["e"]
            term = limb * (1 << (aril.limb_bits * k))
            expr = term if expr is None else expr + term
        t_cols.append(expr)
    b.plookup(f_cols, t_cols, f_sel=mw["isEq0"], t_sel=aril.fixed["FIRST"])

    # ---- Main <-> Memory ---------------------------------------------
    f_cols = [mw["addr"], mf["M_STEP"], mw["mWR"]] \
        + [mw[f"op{j}"] for j in range(8)]
    t_cols = [meml.witness["addr"], meml.witness["step"],
              meml.witness["is_write"]] \
        + [meml.witness[f"val{j}"] for j in range(8)]
    b.permutation(f_cols, t_cols, f_sel=mw["mOp"],
                  t_sel=meml.witness["active"])

    air = b.compile()
    return air, ZkevmLayout(main=main, binary=binl, memory=meml, arith=aril,
                            poseidon=posl)


def gen_trace(air, layout: ZkevmLayout, records, final_regs, required):
    """Fill const + cm1 for the full circuit from an execution.

    records/final_regs: the Main SM trace (main_sm.py Context.trace);
    required: the secondary-SM action vectors (Required).
    Returns (const_np, cm1_np, publics).
    """
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    main_sm_air.fill_fixed(layout.main, const_np)
    binary_sm.fill_fixed(layout.binary, const_np)
    memory_sm.fill_fixed(layout.memory, const_np)
    arith_sm.fill_fixed(layout.arith, const_np)
    poseidon_g_sm.fill_fixed(layout.poseidon, const_np)

    cm1 = np.zeros((n, air.cm1_width), dtype=np.uint64)
    main_sm_air.expand_trace(layout.main, records, final_regs, cm1)

    bin_actions = [(binary_sm.OPNAMES[op], a, b)
                   for (op, a, b, _res, _carry) in required.binary]
    binary_sm.expand_trace(layout.binary, bin_actions, cm1)
    memory_sm.expand_trace(layout.memory, list(required.memory), cm1)
    eq0_actions = [(a, b, c) for (kind, a, b, c, _d, _res) in required.arith
                   if kind == 0]
    arith_sm.expand_trace(layout.arith, eq0_actions, cm1)
    poseidon_g_sm.expand_into(layout.poseidon, list(required.poseidon), cm1)

    publics = main_sm_air.publics_list(layout.main, records, final_regs)
    return const_np, cm1, publics
