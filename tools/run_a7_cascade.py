"""The canonical A.7 aggregation script over REAL fork_9 batches.

Reference: test/service/aggregator/aggregator_service.cpp:18-240 — prove
batches 0..3, aggregate(0,1), aggregate(2,3), aggregate the pair, then
the final stage (RecursiveF -> final R1CS -> Groth16 pairing check).

Usage:
  python tools/run_a7_cascade.py [--n-bits 16] [--n-queries 4]
      [--out PROOF_a7_cascade.json] [--cpu]

Writes stage timings + publics chain + verification results as it goes
(the artifact is updated after every stage, so a partial run still
documents how far it got).
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

REF_ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
REF_SROM = "/root/reference/config/scripts/storage_sm_rom.json"
VEC = "/root/reference/testvectors/e2e/fork_9/input_executor_{}.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-bits", type=int, default=16)
    ap.add_argument("--n-queries", type=int, default=4)
    ap.add_argument("--out", default="PROOF_a7_cascade.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.storage_rom import StorageRom
    from xlayer_prover_tpu.prover_service import BatchProver
    from xlayer_prover_tpu.recursion.stack import (RecursionStack,
                                                   zkevm_chain_spec)
    from xlayer_prover_tpu.snark import groth16
    from xlayer_prover_tpu.stark import verifier

    artifact = {
        "what": "A.7 cascade: 4 real batches -> 3 aggregations -> "
                "RecursiveF -> Groth16 (aggregator_service.cpp:18-240)",
        "backend": jax.default_backend(),
        "n_bits": args.n_bits,
        "n_queries": args.n_queries,
        "stages": {},
        "status": "running",
    }

    def save(**kw):
        artifact.update(kw)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, default=str)

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 2)
        artifact["stages"][name] = dt
        print(f"[a7] {name}: {dt}s", flush=True)
        save()
        return out

    rom = Rom.load_fork(9)
    srom = StorageRom.load_default()
    engine = BatchProver(rom, n_bits=args.n_bits, chunk_bits=4,
                         limb_bits=16, n_queries=args.n_queries,
                         max_steps=1 << (args.n_bits - 1),
                         storage_rom=srom)
    stage("setup_const_tree", engine.setup)

    batch_proofs = []
    publics_chain = []
    for k in range(4):
        inp = BatchInput.load(VEC.format(k))

        def prove_one(k=k, inp=inp):
            proof, _ctx = engine.prove(inp, batch_uuid=f"a7-{k}")
            assert verifier.verify(engine.air, engine.setup().verkey, proof)
            return proof

        proof = stage(f"batch_proof_{k}", prove_one)
        batch_proofs.append(proof)
        publics_chain.append([int(p) for p in proof.publics[:8]])

    link, out_map = zkevm_chain_spec(len(batch_proofs[0].publics))
    stack = RecursionStack(engine.air, engine.setup().verkey,
                           n_queries=args.n_queries, link=link,
                           out_map=out_map)

    lifts = [stage(f"recursive1_{k}",
                   lambda k=k: stack.lift(batch_proofs[k]))
             for k in range(4)]
    agg01 = stage("aggregate_01", lambda: stack.aggregate(lifts[0],
                                                          lifts[1]))
    agg23 = stage("aggregate_23", lambda: stack.aggregate(lifts[2],
                                                          lifts[3]))
    root = stage("aggregate_root", lambda: stack.aggregate(agg01, agg23))
    assert stage("verify_root", lambda: stack.verify(root))

    out = stage("finalize_groth16",
                lambda: stack.finalize(root, wrap="groth16",
                                       rng=random.Random(11)))
    ok = stage("groth16_verify",
               lambda: groth16.verify(out["vk"], out["proof"],
                                      out["publics"]))
    assert ok
    save(status="complete", verified=True,
         groth16_publics=[str(p) for p in out["publics"]],
         batch_publics_head=publics_chain)
    print("[a7] COMPLETE ->", args.out, flush=True)


if __name__ == "__main__":
    main()
