"""RecursionStack: the proof cascade manager.

Mirrors the reference cascade (prover.cpp:392-825): batch STARK ->
recursive1 (verifier-as-circuit compression) -> recursive2 aggregation
layers.  Each aggregation level L verifies two level-(L-1) proofs; engines
are built lazily per level and cached, so a bounded aggregation tree (the
canonical 4-batch -> 3-aggregation -> final script,
test/service/aggregator/aggregator_service.cpp:18-240) uses two levels.

The reference's recursive2 is shape-stable (it verifies proofs of its own
verkey, passed as a public input); the per-level engines here are the
bounded-depth equivalent — the fixpoint form (verkey as circuit input) is
the follow-up once gate counts are padded to a stable domain size.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

from ..utils.log import zklog
from .engine import Recursive1, Recursive2, RecursiveF


@dataclasses.dataclass
class RecursiveProof:
    level: int            # 1 = recursive1 output, 2+ = aggregation levels
    proof: object         # StarkProof of the level's gate air

    def to_json(self):
        return {"level": self.level, "proof": self.proof.to_json()}


class RecursionStack:
    def __init__(self, batch_air, batch_verkey, n_queries: int = 8):
        self.batch_air = batch_air
        self.batch_verkey = list(batch_verkey)
        self.n_queries = n_queries
        self._rec1: Recursive1 = None
        self._agg: Dict[int, Recursive2] = {}

    # -- engines ---------------------------------------------------------
    def rec1(self) -> Recursive1:
        if self._rec1 is None:
            zklog.info("recursion: building recursive1 circuit")
            self._rec1 = Recursive1(self.batch_air, self.batch_verkey,
                                    n_queries=self.n_queries)
        return self._rec1

    def agg_engine(self, level: int) -> Recursive2:
        """Engine aggregating two level-(level-1) proofs."""
        eng = self._agg.get(level)
        if eng is None:
            if level == 2:
                inner = self.rec1()
                inner_air, inner_vk = inner.air, inner.verkey
            else:
                inner = self.agg_engine(level - 1)
                inner_air, inner_vk = inner.air, inner.verkey
            zklog.info(f"recursion: building aggregation level {level}")
            eng = Recursive2(inner_air, inner_vk, n_queries=self.n_queries)
            self._agg[level] = eng
        return eng

    # -- operations ------------------------------------------------------
    def lift(self, proof) -> RecursiveProof:
        """Raw batch StarkProof -> recursive1; recursive proofs pass."""
        if isinstance(proof, RecursiveProof):
            return proof
        return RecursiveProof(level=1, proof=self.rec1().prove(proof))

    def aggregate(self, p1: RecursiveProof, p2: RecursiveProof
                  ) -> RecursiveProof:
        if p1.level != p2.level:
            # Unbalanced trees need the shape-stable recursive2 (verkey as
            # public input); surface a typed error the aggregator client
            # can report instead of an AssertionError.
            from ..utils.zkresult import ZkError, ZkResult
            raise ZkError(ZkResult.PROVER_ERROR,
                          f"cannot aggregate mixed levels "
                          f"{p1.level} and {p2.level}")
        eng = self.agg_engine(p1.level + 1)
        return RecursiveProof(level=p1.level + 1,
                              proof=eng.prove(p1.proof, p2.proof))

    def verify(self, rp: RecursiveProof) -> bool:
        if rp.level == 1:
            return self.rec1().verify(rp.proof)
        return self.agg_engine(rp.level).verify(rp.proof)

    def finalize(self, proof, wrap: str = "stark", snark: bool = True,
                 rng=None):
        """Final-stage packaging (reference genFinalProof,
        prover.cpp:827-980).

        wrap="stark": verify and return the terminal recursive proof.
        wrap="groth16": re-prove through RecursiveF (the same verifier
        circuit over BN254 Poseidon commitments), express ITS verifier as
        a BN254-Fr R1CS (snark/final_circuit.py) and Groth16-prove it —
        the on-chain object.  ``snark=False`` stops after the R1CS
        witness check (the Groth16 MSMs dominate wall-clock; device MSM
        is the planned accelerator).
        """
        rp = self.lift(proof)
        assert self.verify(rp)
        if wrap == "stark":
            return rp

        assert wrap == "groth16", wrap
        from ..snark import final_circuit
        if rp.level == 1:
            inner = self.rec1()
        else:
            inner = self.agg_engine(rp.level)
        key = ("recF", rp.level)
        eng = self._agg.get(key)
        if eng is None:
            zklog.info("recursion: building recursiveF circuit")
            eng = RecursiveF(inner.air, inner.verkey,
                             n_queries=self.n_queries)
            self._agg[key] = eng
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
        pkvk = self._agg.get(g16_key)
        if pkvk is None:
            zklog.info(f"recursion: Groth16 setup over "
                       f"{len(r1cs.constraints)} constraints")
            pkvk = groth16.setup(r1cs, rng=rng)
            self._agg[g16_key] = pkvk
        pk, vk = pkvk
        g_proof = groth16.prove(pk, r1cs, witness, rng=rng)
        assert groth16.verify(vk, g_proof, pubs)
        return {"final": "groth16", "proof": g_proof, "vk": vk,
                "publics": pubs}
