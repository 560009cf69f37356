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


def execute(script: GateScript, inputs):
    """inputs: uint32 (n_inputs, lanes) packed instance bits.
    Returns (n_outputs, lanes) uint32."""

    @jax.jit
    def run(inp):
        lanes = inp.shape[1]
        wires = jnp.zeros((script.n_wires, lanes), dtype=jnp.uint32)
        wires = wires.at[1].set(jnp.uint32(0xFFFFFFFF))
        wires = wires.at[2:2 + script.n_inputs].set(inp)
        for (ops, a, b, r) in script.levels:
            va = wires[a]
            vb = wires[b]
            x = va ^ vb
            ap = (~va) & vb
            res = jnp.where((ops == OP_XOR)[:, None], x, ap)
            wires = wires.at[r].set(res)
        return wires[script.outputs]

    return run(jnp.asarray(inputs, dtype=jnp.uint32))
