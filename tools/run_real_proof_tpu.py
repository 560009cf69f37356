"""Prove a real fork_9 testvector batch ON THE REAL TPU (jit path).

The production proving shape for a tunnel-attached chip: the executor runs
on host (sequential EVM semantics), cm1 is uploaded once, every STARK round
runs device-resident through the jitted pipelines (stark/prover.py jit
path), and only roots / evals / query rows come back (batched gathers — a
remote tunnel charges ~0.4 s per round-trip and ~15 MB/s per pull).
Reference counterpart: Prover::genBatchProof stage timers
(/root/reference/src/prover/prover.cpp:392-674, timer.hpp:17-27).

Usage:
  python tools/run_real_proof_tpu.py [--n-bits 16] [--vector 0]
      [--out PROOF_TPU.json] [--chains]          # chains need n_bits >= 18

Writes a JSON artifact with stage wall-clocks, domain geometry, publics,
and the verification result; the proof itself is saved next to it.
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
    # the environment pins JAX_PLATFORMS=axon; env vars can't override it,
    # only the config call before first device use can (see .claude/skills)
    jax.config.update("jax_platforms", "cpu")

REF_ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
REF_SROM = "/root/reference/config/scripts/storage_sm_rom.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-bits", type=int, default=16)
    ap.add_argument("--vector", type=int, default=0)
    ap.add_argument("--out", default="PROOF_TPU.json")
    ap.add_argument("--chains", action="store_true",
                    help="bind keccak/sha gate chains (needs n_bits >= 18)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (host proof path)")
    args = ap.parse_args()

    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.storage_rom import StorageRom
    from xlayer_prover_tpu.prover_service import BatchProver
    from xlayer_prover_tpu.stark import verifier
    from xlayer_prover_tpu.utils.timer import metrics

    vec = ("/root/reference/testvectors/e2e/fork_9/"
           f"input_executor_{args.vector}.json")
    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)

    stages = {}
    t0 = time.perf_counter()
    rom = Rom.load_fork(9)
    storage_rom = StorageRom.load_default()
    engine = BatchProver(rom, n_bits=args.n_bits, chunk_bits=4,
                         limb_bits=16, n_queries=8,
                         max_steps=1 << (args.n_bits - 1),
                         storage_rom=storage_rom)
    if args.chains:
        assert args.n_bits >= 18, "gate chains need a 2^18 slot"
    # chains auto-bind at n_bits >= 18 (zkevm_air.build defaults)
    chains_bound = engine.executor.layout.keccak is not None \
        and engine.executor.layout.sha is not None
    stages["build_air_s"] = round(time.perf_counter() - t0, 2)
    print(f"AIR built in {stages['build_air_s']}s: cm1={engine.air.cm1_width}"
          f" cm2={engine.air.cm2_width} cm3={engine.air.cm3_width}"
          f" const={engine.air.const_width} n_ext=2^{engine.air.n_bits_ext}",
          flush=True)

    t0 = time.perf_counter()
    setup = engine.setup()
    stages["setup_const_tree_s"] = round(time.perf_counter() - t0, 2)
    print(f"setup (const tree) {stages['setup_const_tree_s']}s", flush=True)

    inp = BatchInput.load(vec)
    t0 = time.perf_counter()
    res = engine.execute_only(inp, batch_uuid=f"tpu-vec{args.vector}")
    stages["executor_s"] = round(time.perf_counter() - t0, 2)
    print(f"executor {stages['executor_s']}s "
          f"steps={res.ctx.counters.steps}", flush=True)

    t0 = time.perf_counter()
    proof = engine.prove_from_trace(res.cm1_np, res.publics)
    stages["gen_proof_s"] = round(time.perf_counter() - t0, 2)
    print(f"gen_proof {stages['gen_proof_s']}s", flush=True)

    t0 = time.perf_counter()
    ok = verifier.verify(engine.air, setup.verkey, proof)
    stages["verify_s"] = round(time.perf_counter() - t0, 2)
    print(f"verify: {ok} ({stages['verify_s']}s)", flush=True)

    artifact = {
        "what": "real fork_9 batch proof on TPU (jit path)",
        "backend": backend,
        "device": str(jax.devices()[0]),
        "vector": args.vector,
        "n_bits": args.n_bits,
        "chains_bound": bool(chains_bound),
        "widths": {"cm1": engine.air.cm1_width, "cm2": engine.air.cm2_width,
                   "cm3": engine.air.cm3_width, "cm4": engine.air.cm4_width,
                   "const": engine.air.const_width},
        "executor_steps": res.ctx.counters.steps,
        "stages": stages,
        "stark_stage_timers": metrics.as_dict(),
        "verified": bool(ok),
        "publics": [int(p) for p in proof.publics],
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    with open(args.out.replace(".json", "_proof.json"), "w") as f:
        f.write(proof.to_json())
    print("artifact ->", args.out, flush=True)


if __name__ == "__main__":
    main()
