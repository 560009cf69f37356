"""Lift a real zkEVM batch proof through recursive1 ON THE TPU jit path.

Loads the proof artifact written by tools/run_real_proof_tpu.py, traces
the native verifier into the standard-shape gate circuit (recursion/
circuit.py), and proves the gate AIR through the jitted device pipeline
— the reference's zkevm-verifier -> c12a/recursive1 stage
(prover.cpp:591-645) with the circom witness calculator replaced by the
traced circuit.

Usage:
  python tools/run_rec1_tpu.py [--proof PROOF_TPU_2e16_proof.json]
      [--n-bits 16] [--n-queries 8] [--out PROOF_rec1_tpu.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proof", default="PROOF_TPU_2e16_proof.json")
    ap.add_argument("--n-bits", type=int, default=16,
                    help="inner proof's domain (must match the artifact)")
    ap.add_argument("--n-queries", type=int, default=8,
                    help="inner proof's query count")
    ap.add_argument("--out", default="PROOF_rec1_tpu.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.storage_rom import StorageRom
    from xlayer_prover_tpu.prover_service import BatchProver
    from xlayer_prover_tpu.recursion.stack import (RecursionStack,
                                                   zkevm_chain_spec)
    from xlayer_prover_tpu.stark.proof import StarkProof

    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)

    with open(args.proof) as f:
        inner = StarkProof.from_json(f.read())
    print(f"inner proof loaded: {len(inner.publics)} publics", flush=True)

    stages = {}
    t0 = time.perf_counter()
    rom = Rom.load_fork(9)
    srom = StorageRom.load_default()
    engine = BatchProver(rom, n_bits=args.n_bits, chunk_bits=4,
                         limb_bits=16, n_queries=args.n_queries,
                         max_steps=1 << (args.n_bits - 1),
                         storage_rom=srom)
    setup = engine.setup()
    stages["air+setup_s"] = round(time.perf_counter() - t0, 2)
    print(f"air+setup {stages['air+setup_s']}s", flush=True)

    link, out_map = zkevm_chain_spec(len(inner.publics))
    stack = RecursionStack(engine.air, setup.verkey,
                           n_queries=args.n_queries, link=link,
                           out_map=out_map)
    t0 = time.perf_counter()
    rec1 = stack.rec1()
    stages["build_rec1_circuit_s"] = round(time.perf_counter() - t0, 2)
    print(f"rec1 circuit built {stages['build_rec1_circuit_s']}s",
          flush=True)

    t0 = time.perf_counter()
    lifted = stack.lift(inner)
    stages["lift_prove_s"] = round(time.perf_counter() - t0, 2)
    print(f"lift proved {stages['lift_prove_s']}s", flush=True)

    t0 = time.perf_counter()
    ok = stack.verify(lifted) if lifted.level == 2 else \
        rec1.verify(lifted.proof)
    stages["verify_s"] = round(time.perf_counter() - t0, 2)
    print(f"verified: {ok}", flush=True)

    art = {
        "what": "recursive1 over a real zkEVM batch proof ON TPU "
                "(jit path)",
        "backend": backend,
        "device": str(jax.devices()[0]),
        "inner_proof": args.proof,
        "inner_n_bits": args.n_bits,
        "gate_air": {
            "n_bits": rec1.air.n_bits,
            "cm1_width": rec1.air.cm1_width,
        },
        "stages": stages,
        "verified": bool(ok),
        "publics_carried": [int(p) for p in lifted.proof.publics][:8],
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    with open(args.out.replace(".json", "_proof.json"), "w") as f:
        f.write(lifted.proof.to_json())
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()
