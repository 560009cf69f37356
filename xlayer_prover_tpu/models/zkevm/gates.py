"""Gate framework: boolean circuit builder + levelized device executor.

Equivalent of the reference gate framework (src/sm/gate/) and the build-time
Keccak/SHA circuit script generators (tools/sm/keccak_f/keccak_gen.cpp): a
hash permutation is expressed as a DAG of XOR / ANDP (= ~a & b) gates; the
KeccakF SM executes the script over bit-packed instance lanes
(src/sm/keccak_f/keccak_f_executor.hpp:34-71).

TPU-native execution: the gate list is topologically levelized; each level
runs as one vectorized step — gather operand wires, compute XOR and ANDP on
the whole level, select by opcode, scatter results.  Wire values are
uint32-packed instance lanes, so one evaluation fills 32 * lanes instances
(pure VPU bitwise work, ~circuit-depth many fused steps).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OP_XOR = 0
OP_ANDP = 1  # (~a) & b


class GateBuilder:
    """Builds a gate DAG; wire 0 is constant 0, wire 1 is constant 1."""

    def __init__(self, n_inputs: int):
        self.n_inputs = n_inputs
        self.n_wires = 2 + n_inputs     # [zero, one, inputs...]
        self.gates: List[Tuple[int, int, int, int]] = []  # (op, a, b, r)
        self._xor_cache = {}

    def input_wire(self, i: int) -> int:
        return 2 + i

    @property
    def ZERO(self):
        return 0

    @property
    def ONE(self):
        return 1

    def _emit(self, op: int, a: int, b: int) -> int:
        key = (op, a, b) if op == OP_ANDP else (op, min(a, b), max(a, b))
        hit = self._xor_cache.get(key)
        if hit is not None:
            return hit
        r = self.n_wires
        self.n_wires += 1
        self.gates.append((op, a, b, r))
        self._xor_cache[key] = r
        return r

    def xor(self, a: int, b: int) -> int:
        if a == 0:
            return b
        if b == 0:
            return a
        return self._emit(OP_XOR, a, b)

    def andp(self, a: int, b: int) -> int:
        """(~a) & b."""
        if b == 0:
            return 0
        if a == 0:
            return b
        return self._emit(OP_ANDP, a, b)

    def xor_many(self, wires) -> int:
        acc = 0
        for w in wires:
            acc = self.xor(acc, w)
        return acc


@dataclasses.dataclass
class GateScript:
    """Levelized gate program + output wire map."""
    n_inputs: int
    n_wires: int
    levels: list            # per level: (ops[], a[], b[], r[]) int32 arrays
    outputs: np.ndarray     # wire index per output bit
    gates: list = None      # raw (op, a, b, r) emission order (for the AIR)

    @property
    def n_gates(self):
        return sum(len(l[0]) for l in self.levels)

    @property
    def depth(self):
        return len(self.levels)


def levelize(builder: GateBuilder, output_wires) -> GateScript:
    depth = np.zeros(builder.n_wires, dtype=np.int64)
    levels_acc = {}
    for (op, a, b, r) in builder.gates:
        d = max(depth[a], depth[b]) + 1
        depth[r] = d
        levels_acc.setdefault(d, []).append((op, a, b, r))
    levels = []
    for d in sorted(levels_acc):
        arr = np.array(levels_acc[d], dtype=np.int32)
        levels.append((arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]))
    return GateScript(n_inputs=builder.n_inputs, n_wires=builder.n_wires,
                      levels=levels,
                      outputs=np.asarray(output_wires, dtype=np.int32),
                      gates=list(builder.gates))


def execute_all_wires_np(script: GateScript, inputs: np.ndarray,
                         pack_bits: int) -> np.ndarray:
    """Host-numpy evaluation returning EVERY wire value (for AIR trace
    fill): inputs is (n_inputs,) uint64 of pack_bits-packed instance bits;
    returns (n_wires,) uint64."""
    mask = np.uint64((1 << pack_bits) - 1)
    wires = np.zeros(script.n_wires, dtype=np.uint64)
    wires[1] = mask
    wires[2:2 + script.n_inputs] = np.asarray(inputs, dtype=np.uint64)
    for (ops, a, b, r) in script.levels:
        va = wires[a]
        vb = wires[b]
        res = np.where(ops == OP_XOR, va ^ vb, (~va) & vb) & mask
        wires[r] = res
    return wires


def _pack_rows(script: GateScript):
    """Capacity-packed ASAP schedule: gates are laid out into uniform-width
    rows (a gate lands on the first row after both its operands that still
    has a free slot), so device execution is ONE lax.scan over a dense
    (n_rows, W) table instead of an unrolled per-level graph — compile
    time is a single small body, not O(n_gates)."""
    total = sum(len(l[0]) for l in script.levels)
    depth = max(1, len(script.levels))
    w = 64
    while w < max(64, total // depth):
        w *= 2
    row_of = np.zeros(script.n_wires, dtype=np.int64)   # row that wrote wire
    counts: list = [0]
    rows: list = [[]]
    for (ops, a_arr, b_arr, r_arr) in script.levels:
        for op, a, b, r in zip(ops, a_arr, b_arr, r_arr):
            e = int(max(row_of[a], row_of[b])) + 1
            while True:
                while e >= len(rows):
                    rows.append([])
                    counts.append(0)
                if counts[e] < w:
                    break
                e += 1
            rows[e].append((op, a, b, r))
            counts[e] += 1
            row_of[r] = e
    n_rows = len(rows)
    ops_t = np.zeros((n_rows, w), dtype=np.int32)   # pad: XOR(0,0) -> wire 0
    a_t = np.zeros((n_rows, w), dtype=np.int32)
    b_t = np.zeros((n_rows, w), dtype=np.int32)
    r_t = np.zeros((n_rows, w), dtype=np.int32)
    for i, row in enumerate(rows):
        for j, (op, a, b, r) in enumerate(row):
            ops_t[i, j] = op
            a_t[i, j] = a
            b_t[i, j] = b
            r_t[i, j] = r
    return ops_t, a_t, b_t, r_t


def execute(script: GateScript, inputs):
    """inputs: uint32 (n_inputs, lanes) packed instance bits.
    Returns (n_outputs, lanes) uint32."""
    if not hasattr(script, "_packed_rows"):
        script._packed_rows = _pack_rows(script)
    ops_t, a_t, b_t, r_t = script._packed_rows

    @jax.jit
    def run(inp, ops_t, a_t, b_t, r_t):
        lanes = inp.shape[1]
        wires = jnp.zeros((script.n_wires, lanes), dtype=jnp.uint32)
        wires = wires.at[1].set(jnp.uint32(0xFFFFFFFF))
        wires = wires.at[2:2 + script.n_inputs].set(inp)

        def body(wires, row):
            ops, a, b, r = row
            va = wires[a]
            vb = wires[b]
            res = jnp.where((ops == OP_XOR)[:, None], va ^ vb, (~va) & vb)
            return wires.at[r].set(res), None

        wires, _ = jax.lax.scan(body, wires, (ops_t, a_t, b_t, r_t))
        return wires[script.outputs]

    return run(jnp.asarray(inputs, dtype=jnp.uint32),
               ops_t, a_t, b_t, r_t)
