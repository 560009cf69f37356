"""PLONK arithmetization over BN254 Fr (the circuit form fflonk proves).

The reference's fflonk prover consumes a PLONK-ified circom circuit via
zkey_fflonk (src/rapidsnark/fflonk_prover.hpp, zkey_fflonk.cpp); here the
same role is filled by a small 3-wire gate system plus an R1CS converter,
so the Groth16 final circuit (snark/final_circuit.py R1CS) can be proven
by either backend.

Gate equation (per row i):
    qM*a*b + qL*a + qR*b + qO*c + qC + PI = 0
Copy constraints: one permutation sigma over the 3n wire slots encoded as
S1,S2,S3 polynomials on cosets {1, k1, k2} (k1=2, k2=3), the standard
PLONK permutation argument.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

from ..fields.bn254 import R
from .r1cs import R1CS


@dataclasses.dataclass
class PlonkGate:
    qM: int = 0
    qL: int = 0
    qR: int = 0
    qO: int = 0
    qC: int = 0
    a: int = 0          # wire ids (0 = the constant-zero wire)
    b: int = 0
    c: int = 0


@dataclasses.dataclass
class PlonkCircuit:
    gates: List[PlonkGate]
    n_public: int                # first n_public gates are PI gates
    n_wires: int

    @property
    def n(self) -> int:
        n = max(len(self.gates), 2)
        return 1 << (n - 1).bit_length()


def r1cs_to_plonk(r1cs: R1CS) -> PlonkCircuit:
    """Each R1CS constraint (A.w)(B.w) = (C.w) becomes LC-accumulation
    gates + one multiplication gate.  R1CS wire 0 is the constant 1;
    PLONK wire 0 is constant 0, so R1CS wires map to id+1 and constants
    fold into qC."""
    gates: List[PlonkGate] = []
    n_plonk_wires = r1cs.n_wires + 1     # +1: plonk zero wire at 0
    next_wire = [n_plonk_wires]

    def fresh() -> int:
        w = next_wire[0]
        next_wire[0] += 1
        return w

    # public-input gates first (PLONK convention: PI rows lead)
    for i in range(r1cs.n_public):
        gates.append(PlonkGate(qL=1, a=i + 2))   # r1cs wire 1+i -> 2+i

    def lc_wire(lc: Dict[int, int]) -> Tuple[int, int]:
        """Reduce a linear combination to (wire, const): the value is
        wire_value + const.  Emits accumulation gates as needed."""
        const = lc.get(0, 0) % R
        terms = [(w, k % R) for (w, k) in lc.items() if w != 0 and k % R]
        if not terms:
            return 0, const
        if len(terms) == 1 and terms[0][1] == 1:
            return terms[0][0] + 1, const
        acc_wire = 0
        first = True
        for (w, k) in terms:
            if first:
                # acc = k*w  via gate: qL*k*a - acc = 0
                acc = fresh()
                gates.append(PlonkGate(qL=k, qO=R - 1, a=w + 1, c=acc))
                acc_wire = acc
                first = False
            else:
                acc = fresh()
                gates.append(PlonkGate(qL=1, qR=k, qO=R - 1,
                                       a=acc_wire, b=w + 1, c=acc))
                acc_wire = acc
        return acc_wire, const

    for (A, B, C) in r1cs.constraints:
        wa, ca = lc_wire(A)
        wb, cb = lc_wire(B)
        wc, cc = lc_wire(C)
        # (wa + ca)(wb + cb) = (wc + cc)
        # qM*a*b + cb*a + ca*b + (-1)*c + (ca*cb - cc) = 0
        gates.append(PlonkGate(qM=1, qL=cb % R, qR=ca % R, qO=R - 1,
                               qC=(ca * cb - cc) % R,
                               a=wa, b=wb, c=wc))
    return PlonkCircuit(gates=gates, n_public=r1cs.n_public,
                        n_wires=next_wire[0])


def plonk_witness(circuit: PlonkCircuit, r1cs: R1CS,
                  r1cs_witness: List[int]) -> List[int]:
    """Wire values for the converted circuit: plonk wire 0 = 0, wires
    1..n_r1cs = r1cs witness, accumulator wires re-derived by replaying
    the gates."""
    vals = [0] + [int(v) % R for v in r1cs_witness]
    vals += [0] * (circuit.n_wires - len(vals))
    for g in circuit.gates:
        if g.c != 0 and g.qO == R - 1 and g.qM == 0 and g.qC == 0:
            # accumulation gate: c = qL*a + qR*b
            vals[g.c] = (g.qL * vals[g.a] + g.qR * vals[g.b]) % R
    return vals


def check_plonk(circuit: PlonkCircuit, vals: List[int],
                publics: List[int]) -> bool:
    for i, g in enumerate(circuit.gates):
        pi = -int(publics[i]) % R if i < circuit.n_public else 0
        a, b, c = vals[g.a], vals[g.b], vals[g.c]
        if (g.qM * a * b + g.qL * a + g.qR * b + g.qO * c + g.qC + pi) \
                % R != 0:
            return False
    return True


def wire_columns(circuit: PlonkCircuit, vals: List[int]):
    """(a_col, b_col, c_col) of length n (zero-padded) + the copy
    permutation sigma over the 3n slots (slot j*n + i <-> column j row
    i); slots holding the same wire form a cycle."""
    n = circuit.n
    a = [0] * n
    b = [0] * n
    c = [0] * n
    occurrences: Dict[int, List[int]] = {}
    for i, g in enumerate(circuit.gates):
        a[i] = vals[g.a] if vals else 0
        b[i] = vals[g.b] if vals else 0
        c[i] = vals[g.c] if vals else 0
        for col, wire in ((0, g.a), (1, g.b), (2, g.c)):
            if wire != 0:
                occurrences.setdefault(wire, []).append(col * n + i)
    sigma = list(range(3 * n))
    for slots in occurrences.values():
        if len(slots) > 1:
            for idx, s in enumerate(slots):
                sigma[s] = slots[(idx + 1) % len(slots)]
    return (a, b, c), sigma
