"""RecursionStack: the proof cascade manager.

Mirrors the reference cascade (prover.cpp:392-825): batch STARK ->
recursive1 (verifier-as-circuit compression) -> recursive2 aggregation.
Recursive2 is SHAPE-STABLE (engine.py): one engine aggregates recursive1
proofs, its own proofs, or a mix, so aggregation trees of any depth and
shape (incl. unbalanced ones — 3 or 5 batches) use exactly two circuits,
like the reference's recursive1/recursive2 pair
(test/service/aggregator/aggregator_service.cpp:18-240).

Soundness chain: every proof carries the verkey its non-leaf children
were verified against in publics[0:4] (0000 marks a recursive1 leaf);
``verify``/``finalize`` pin the root's carried verkey to the recursive2
engine's own key, which transitively fixes every interior node (the
reference's rootC public).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

from ..utils.log import zklog
from .engine import Recursive1, Recursive2, RecursiveF, build_recursion_pair


def zkevm_chain_spec(n_publics: int):
    """(link, out_map) for the zkEVM publics layout (prover.cpp:494-543):
    the chain rule pins p1.newStateRoot == p2.oldStateRoot in-circuit and
    the aggregate exposes old* from p1 and new* from p2 — recursive2's
    semantics for both the 27-slot (legacy) and 44-slot layouts."""
    assert n_publics in (27, 44), n_publics
    link = [(19 + k, k) for k in range(8)]
    out_map = [("p1", i) for i in range(19)] + \
              [("p2", i) for i in range(19, n_publics)]
    return link, out_map


@dataclasses.dataclass
class RecursiveProof:
    level: int            # 1 = recursive1 output, 2 = aggregation output
    proof: object         # StarkProof of the standard-shape gate air

    def to_json(self):
        return {"level": self.level, "proof": self.proof.to_json()}


class RecursionStack:
    def __init__(self, batch_air, batch_verkey, n_queries: int = 8,
                 link=None, out_map=None):
        self.batch_air = batch_air
        self.batch_verkey = list(batch_verkey)
        self.n_queries = n_queries
        self.link = link
        self.out_map = out_map
        self._rec1: Recursive1 = None
        self._rec2: Recursive2 = None
        self._aux: Dict[object, object] = {}

    # -- engines ---------------------------------------------------------
    def _ensure_pair(self):
        if self._rec1 is None:
            zklog.info("recursion: building recursive1/recursive2 pair")
            self._rec1, self._rec2 = build_recursion_pair(
                self.batch_air, self.batch_verkey,
                n_queries=self.n_queries, link=self.link,
                out_map=self.out_map)

    def rec1(self) -> Recursive1:
        self._ensure_pair()
        return self._rec1

    def rec2(self) -> Recursive2:
        self._ensure_pair()
        return self._rec2

    # -- operations ------------------------------------------------------
    def lift(self, proof) -> RecursiveProof:
        """Raw batch StarkProof -> recursive1; recursive proofs pass."""
        if isinstance(proof, RecursiveProof):
            return proof
        return RecursiveProof(level=1, proof=self.rec1().prove(proof))

    def aggregate(self, p1: RecursiveProof, p2: RecursiveProof
                  ) -> RecursiveProof:
        """Aggregate two recursive proofs — levels may differ (the
        shape-stable circuit dispatches per child on the leaf marker)."""
        eng = self.rec2()
        return RecursiveProof(level=2,
                              proof=eng.prove(p1.proof, p2.proof))

    def verify(self, rp: RecursiveProof) -> bool:
        if rp.level == 1:
            return self.rec1().verify(rp.proof)
        return self.rec2().verify(rp.proof)

    def finalize(self, proof, wrap: str = "stark", snark: bool = True,
                 rng=None):
        """Final-stage packaging (reference genFinalProof,
        prover.cpp:827-980).

        wrap="stark": verify (incl. the root carried-verkey pin) and
        return the terminal recursive proof.
        wrap="groth16": re-prove through RecursiveF (the same verifier
        circuit over BN254 Poseidon commitments), express ITS verifier as
        a BN254-Fr R1CS (snark/final_circuit.py) and Groth16-prove it —
        the on-chain object.  The RecursiveF publics re-expose the carried
        verkey, so the L1 verifier pins it exactly like the reference's
        rootC public.  ``snark=False`` stops after the R1CS witness check
        (the Groth16 MSMs dominate wall-clock)."""
        rp = self.lift(proof)
        assert self.verify(rp)
        if wrap == "stark":
            return rp

        assert wrap == "groth16", wrap
        from ..snark import final_circuit
        inner = self.rec1() if rp.level == 1 else self.rec2()
        key = ("recF", rp.level)
        eng = self._aux.get(key)
        if eng is None:
            zklog.info("recursion: building recursiveF circuit")
            eng = RecursiveF(inner.air, inner.verkey,
                             n_queries=self.n_queries)
            self._aux[key] = eng
        bn_proof = eng.prove(rp.proof)
        r1cs, witness, _fb = final_circuit.build_final_circuit(
            eng.air, eng.setup.verkey, bn_proof)
        pubs = witness[1:1 + r1cs.n_public]
        if not snark:
            from ..snark.r1cs import check_witness
            assert check_witness(r1cs, witness)
            return {"final": "r1cs", "n_constraints": len(r1cs.constraints),
                    "publics": pubs}
        from ..snark import groth16
        g16_key = ("g16", rp.level)
        pkvk = self._aux.get(g16_key)
        if pkvk is None:
            zklog.info(f"recursion: Groth16 setup over "
                       f"{len(r1cs.constraints)} constraints")
            pkvk = groth16.setup(r1cs, rng=rng)
            self._aux[g16_key] = pkvk
        pk, vk = pkvk
        g_proof = groth16.prove(pk, r1cs, witness, rng=rng)
        assert groth16.verify(vk, g_proof, pubs)
        return {"final": "groth16", "proof": g_proof, "vk": vk,
                "publics": pubs}
