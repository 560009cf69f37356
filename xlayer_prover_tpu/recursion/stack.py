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
from .engine import Recursive1, Recursive2


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
        assert p1.level == p2.level, \
            "can only aggregate proofs of the same level"
        eng = self.agg_engine(p1.level + 1)
        return RecursiveProof(level=p1.level + 1,
                              proof=eng.prove(p1.proof, p2.proof))

    def verify(self, rp: RecursiveProof) -> bool:
        if rp.level == 1:
            return self.rec1().verify(rp.proof)
        return self.agg_engine(rp.level).verify(rp.proof)

    def finalize(self, proof):
        """Final-stage packaging: verify and return the terminal proof
        (the Groth16/recursiveF wrap extends here)."""
        rp = self.lift(proof)
        assert self.verify(rp)
        return rp
