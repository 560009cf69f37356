"""Recursion engines: recursive1 (one proof in, one proof out) and
recursive2 (two proofs aggregated into one).

Mirrors the reference cascade (prover.cpp:392-825): a batch STARK is
compressed by proving its verifier as a gate circuit (c12a/recursive1);
two such proofs aggregate through a circuit verifying both
(recursive2), whose own shape is again recursive2-verifiable so
aggregation trees of any depth work.  Setups (circuit + const tree) are
built once per inner geometry and reused for every proof.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..stark import prover as stark_prover
from ..stark import verifier as stark_verifier
from . import gate_air
from .circuit import Tracer
from .verifier_circuit import flatten_proof, trace_verify


@dataclasses.dataclass
class _Engine:
    inner_air: object
    inner_verkey: list
    air: object
    layout: object
    setup: object
    n_inner: int

    def verify(self, proof):
        return stark_verifier.verify(self.air, self.setup.verkey, proof)


def _build(tracer: Tracer, n_queries: int, n_bits: Optional[int],
           scheme: str = "gl"):
    air, layout = gate_air.build(tracer, n_bits=n_bits,
                                 n_queries=n_queries)
    air.scheme = scheme
    n = air.n
    const_np = np.zeros((n, air.const_width), dtype=np.uint64)
    gate_air.fill_fixed(layout, const_np)
    setup = stark_prover.Setup.build(air, const_np)
    return air, layout, setup


class Recursive1:
    """Wrap one inner proof: prove that the inner verifier accepts it."""

    def __init__(self, inner_air, inner_verkey, n_queries: int = 8,
                 n_bits: Optional[int] = None, scheme: str = "gl"):
        self.inner_air = inner_air
        self.inner_verkey = list(inner_verkey)
        tracer = Tracer()
        self._pw = trace_verify(tracer, inner_air, self.inner_verkey)
        for p in self._pw.publics:
            tracer.mark_public(p)
        self.tracer = tracer
        self.air, self.layout, self.setup = _build(tracer, n_queries, n_bits,
                                                   scheme)

    @property
    def verkey(self):
        return self.setup.verkey

    def prove(self, inner_proof):
        inputs = flatten_proof(self.inner_air, inner_proof)
        cm1 = np.zeros((self.air.n, self.air.cm1_width), dtype=np.uint64)
        vals = gate_air.fill_witness(self.layout, inputs, cm1)
        publics = gate_air.publics_of(self.layout, vals)
        return stark_prover.gen_proof(self.setup, cm1, publics)

    def verify(self, proof):
        return stark_verifier.verify(self.air, self.setup.verkey, proof)


class Recursive2:
    """Aggregate two proofs of the same inner circuit into one.

    publics of the aggregate = publics(p1) ++ publics(p2); an optional
    ``link`` list of (i, j) pairs constrains publics1[i] == publics2[j]
    in-circuit (the zkEVM chain rule newStateRoot_1 == oldStateRoot_2)."""

    def __init__(self, inner_air, inner_verkey, n_queries: int = 8,
                 n_bits: Optional[int] = None, link=None):
        self.inner_air = inner_air
        self.inner_verkey = list(inner_verkey)
        tracer = Tracer()
        self._pw1 = trace_verify(tracer, inner_air, self.inner_verkey)
        self._pw2 = trace_verify(tracer, inner_air, self.inner_verkey)
        for (i, j) in (link or []):
            tracer.assert_eq(self._pw1.publics[i], self._pw2.publics[j])
        for p in self._pw1.publics:
            tracer.mark_public(p)
        for p in self._pw2.publics:
            tracer.mark_public(p)
        self.tracer = tracer
        self.air, self.layout, self.setup = _build(tracer, n_queries, n_bits)

    @property
    def verkey(self):
        return self.setup.verkey

    def prove(self, proof1, proof2):
        inputs = flatten_proof(self.inner_air, proof1) \
            + flatten_proof(self.inner_air, proof2)
        cm1 = np.zeros((self.air.n, self.air.cm1_width), dtype=np.uint64)
        vals = gate_air.fill_witness(self.layout, inputs, cm1)
        publics = gate_air.publics_of(self.layout, vals)
        return stark_prover.gen_proof(self.setup, cm1, publics)

    def verify(self, proof):
        return stark_verifier.verify(self.air, self.setup.verkey, proof)


class RecursiveF(Recursive1):
    """Recursive1 over the BN128 commitment stack (starkRecursiveF.cpp):
    the same verifier-as-gate-circuit, committed with Poseidon-BN254
    arity-16 Merkle trees + TranscriptBN128, so the output proof is cheap
    to verify inside the BN254 final circuit (snark/final_circuit.py)."""

    def __init__(self, inner_air, inner_verkey, n_queries: int = 8,
                 n_bits: Optional[int] = None):
        super().__init__(inner_air, inner_verkey, n_queries=n_queries,
                         n_bits=n_bits, scheme="bn128")
