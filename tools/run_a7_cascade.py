"""The canonical A.7 aggregation script over REAL fork_9 batches.

Reference: test/service/aggregator/aggregator_service.cpp:18-240 — prove
batches 0..3, aggregate(0,1), aggregate(2,3), aggregate the pair, then
the final stage (RecursiveF -> final R1CS -> Groth16 pairing check).

Every completed stage persists its proof under --state-dir, so an
interrupted run resumes where it stopped (the reference's equivalent is
the saveProofToFile/runFileGen* stage replay, config.hpp:56-63).

Usage:
  python tools/run_a7_cascade.py [--n-bits 17] [--n-queries 4]
      [--vectors 0,1,2,3] [--out PROOF_a7_cascade.json] [--cpu]
      [--state-dir a7_state]

The artifact is updated after every stage, so a partial run still
documents how far it got.

Parallel workers: the host pipeline is largely single-threaded
(eager numpy), so independent stages scale ~linearly across processes.
  python tools/run_a7_cascade.py --cpu --worker batch:2   # prove vec 2
  python tools/run_a7_cascade.py --cpu --worker lift:0    # rec1 of batch 0
  python tools/run_a7_cascade.py --cpu --worker agg:01    # aggregate(l0,l1)
Each worker computes exactly one stage and persists it to --state-dir;
the orchestrating run (no --worker) picks persisted stages up as
"resumed".  Workers for lift/agg wait for their inputs to appear.
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


def build_devnet_inputs(engine, n_batches: int, chain_id: int = 1001):
    """n REAL chained batches through the fork_9 ROM: batch k carries one
    signed legacy transfer at nonce k, and each input's pre-state is the
    post-state of batch k-1 — so newStateRoot_k == oldStateRoot_{k+1} and
    the aggregation chain rule (zkevm_chain_spec link) binds for real.
    Deterministic: workers rebuild identical inputs (planning passes are
    a few hundred ROM steps each).

    The reference's A.7 vectors (input_executor_0..3) also chain, but
    vectors 2/3 need a 2^17 slot (1322 binary ops); this builder gives a
    chained quad that fits 2^14-2^15 so the cascade completes in-round."""
    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.state.datastream import (batch_to_l2_data,
                                                    datastream2batch)
    from xlayer_prover_tpu.state.witness import witness2db
    from xlayer_prover_tpu.utils import devnet

    priv1, priv2 = 0xA11CE, 0xB0B
    a1, a2 = devnet.address_of(priv1), devnet.address_of(priv2)
    g = devnet.build_genesis([
        devnet.Account(address=a1, balance=10 ** 18),
        devnet.Account(address=a2, balance=5)])
    wres = witness2db(devnet.encode_witness(g))
    nodes = {k: list(v) for k, v in wres.db.items()}
    programs = {k: bytes(v) for k, v in wres.programs.items()}
    state_root = wres.state_root
    acc_hash = 0
    inputs = []
    for k in range(n_batches):
        tx = devnet.sign_legacy_tx(nonce=k, gas_price=10 ** 9, gas=21000,
                                   to=a2, value=1000 + k, data=b"",
                                   chain_id=chain_id, priv=priv1)
        batch = datastream2batch(devnet.encode_datastream(
            batch_number=k + 1, chain_id=chain_id, fork_id=9, coinbase=a2,
            blocks=[{"block_number": k + 1, "timestamp": 100 * (k + 1),
                     "delta_timestamp": 100, "l1_info_tree_index": 0,
                     "txs": [tx]}]))
        inp = BatchInput(old_state_root=state_root,
                         old_acc_input_hash=acc_hash, old_batch_num=k,
                         chain_id=chain_id, fork_id=9,
                         batch_l2_data=batch_to_l2_data(batch),
                         sequencer_addr=a2,
                         timestamp_limit=200 * (k + 1))
        inp.db_raw = dict(nodes)
        inp.programs_raw = dict(programs)
        inputs.append(inp)
        # planning pass: execute batch k to chain batch k+1's pre-state
        if k + 1 < n_batches:
            res = engine.execute_only(inp, batch_uuid=f"plan-{k}")
            pub = [int(p) for p in res.publics]
            state_root = 0
            acc_hash = 0
            for i in range(8):
                state_root |= pub[19 + i] << (32 * i)
                acc_hash |= pub[27 + i] << (32 * i)
            store = res.ctx.hashdb.batches.get(f"plan-{k}")
            if store is not None:
                for kq, v in store.overlay.items():
                    nodes[kq] = list(v)
                for kq, d in store.programs.items():
                    programs[kq] = bytes(d)
    return inputs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-bits", type=int, default=17,
                    help="batch domain; vectors 2/3 carry 1322 binary "
                         "ops x 64 rows and need >= 2^17")
    ap.add_argument("--n-queries", type=int, default=4)
    ap.add_argument("--vectors", default="0,1,2,3")
    ap.add_argument("--out", default="PROOF_a7_cascade.json")
    ap.add_argument("--state-dir", default="a7_state")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--worker", default=None,
                    help="run ONE stage and exit: batch:K | lift:K | "
                         "agg:01 | agg:23 | agg:root")
    ap.add_argument("--limb-bits", type=int, default=16,
                    help="arith limb width; the 2^16 range table needs "
                         "n_bits >= 16 — use 8 for 2^14/2^15 slots")
    ap.add_argument("--devnet", type=int, default=0,
                    help="use N synthetic chained devnet batches instead "
                         "of the reference vectors (fits 2^14-2^15 slots)")
    args = ap.parse_args()
    if args.devnet:
        vecs = [f"dev{k}" for k in range(args.devnet)]
    else:
        vecs = [int(v) for v in args.vectors.split(",")]

    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.storage_rom import StorageRom
    from xlayer_prover_tpu.prover_service import BatchProver
    from xlayer_prover_tpu.recursion.stack import (RecursionStack,
                                                   RecursiveProof,
                                                   zkevm_chain_spec)
    from xlayer_prover_tpu.snark import groth16
    from xlayer_prover_tpu.stark import verifier
    from xlayer_prover_tpu.stark.proof import StarkProof

    os.makedirs(args.state_dir, exist_ok=True)
    artifact = {
        "what": "A.7 cascade: 4 real batches -> 3 aggregations -> "
                "RecursiveF -> Groth16 (aggregator_service.cpp:18-240)",
        "backend": jax.default_backend(),
        "n_bits": args.n_bits,
        "n_queries": args.n_queries,
        "limb_bits": args.limb_bits,
        "vectors": vecs,
        "stages": {},
        "status": "running",
    }

    def save(**kw):
        artifact.update(kw)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, default=str)

    def _path(name):
        return os.path.join(args.state_dir,
                            f"{name}_nb{args.n_bits}_q{args.n_queries}.json")

    def stage(name, fn, level=None):
        """Run fn (returning a StarkProof or RecursiveProof), resuming
        from the persisted result when present (a parallel --worker may
        land it at any time)."""
        out = read_stage(name)
        if out is not None:
            artifact["stages"][name] = "resumed"
            print(f"[a7] {name}: resumed from {_path(name)}", flush=True)
            save()
            return out
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 2)
        artifact["stages"][name] = dt
        write_stage(name, out)
        print(f"[a7] {name}: {dt}s", flush=True)
        save()
        return out

    def tstage(name, fn):
        """Timed non-proof stage (setup / verification / final snark)."""
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 2)
        artifact["stages"][name] = dt
        print(f"[a7] {name}: {dt}s", flush=True)
        save()
        return out

    def read_stage(name):
        p = _path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            blob = json.load(f)
        proof = StarkProof.from_json(blob["proof"])
        return RecursiveProof(level=blob["level"], proof=proof) \
            if blob.get("level") else proof

    def write_stage(name, out):
        if isinstance(out, RecursiveProof):
            blob = {"level": out.level, "proof": out.proof.to_json()}
        else:
            blob = {"level": 0, "proof": out.to_json()}
        p = _path(name)
        tmp = p + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(blob, f)
        os.replace(tmp, p)

    def wait_stage(name, timeout_s=4 * 3600):
        t0 = time.time()
        while True:
            out = read_stage(name)
            if out is not None:
                return out
            if time.time() - t0 > timeout_s:
                raise TimeoutError(f"stage {name} never appeared")
            time.sleep(20)

    rom = Rom.load_fork(9)
    srom = StorageRom.load_default()
    engine = BatchProver(rom, n_bits=args.n_bits, chunk_bits=4,
                         limb_bits=args.limb_bits, n_queries=args.n_queries,
                         max_steps=1 << (args.n_bits - 1),
                         storage_rom=srom)

    _devnet_inputs = None

    def load_input(k: int) -> "BatchInput":
        nonlocal _devnet_inputs
        if args.devnet:
            if _devnet_inputs is None:
                _devnet_inputs = build_devnet_inputs(engine, args.devnet)
            return _devnet_inputs[k]
        return BatchInput.load(VEC.format(vecs[k]))

    if args.worker:
        kind, _, arg = args.worker.partition(":")
        t0 = time.perf_counter()
        engine.setup()
        print(f"[a7:{args.worker}] setup "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        def make_stack(n_publics):
            link, out_map = zkevm_chain_spec(n_publics)
            return RecursionStack(engine.air, engine.setup().verkey,
                                  n_queries=args.n_queries, link=link,
                                  out_map=out_map)

        t0 = time.perf_counter()
        if kind == "batch":
            k = int(arg)
            name = f"batch_proof_{k}v{vecs[k]}"
            if read_stage(name) is None:
                inp = load_input(k)
                proof, _ctx = engine.prove(inp, batch_uuid=f"a7-{k}")
                assert verifier.verify(engine.air, engine.setup().verkey,
                                       proof)
                write_stage(name, proof)
        elif kind == "lift":
            k = int(arg)
            name = f"recursive1_{k}"
            if read_stage(name) is None:
                inner = wait_stage(f"batch_proof_{k}v{vecs[k]}")
                write_stage(name,
                            make_stack(len(inner.publics)).lift(inner))
        elif kind == "agg":
            name = {"01": "aggregate_01", "23": "aggregate_23",
                    "root": "aggregate_root"}[arg]
            if read_stage(name) is None:
                if arg == "root":
                    a = wait_stage("aggregate_01")
                    b = wait_stage("aggregate_23")
                else:
                    a = wait_stage(f"recursive1_{arg[0]}")
                    b = wait_stage(f"recursive1_{arg[1]}")
                base = wait_stage(f"batch_proof_0v{vecs[0]}")
                write_stage(name,
                            make_stack(len(base.publics)).aggregate(a, b))
        else:
            raise SystemExit(f"unknown worker kind {kind!r}")
        print(f"[a7:{args.worker}] done "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        return

    tstage("setup_const_tree", engine.setup)

    batch_proofs = []
    publics_chain = []
    for k, v in enumerate(vecs):
        inp = load_input(k)

        def prove_one(inp=inp, k=k):
            proof, _ctx = engine.prove(inp, batch_uuid=f"a7-{k}")
            assert verifier.verify(engine.air, engine.setup().verkey, proof)
            return proof

        proof = stage(f"batch_proof_{k}v{v}", prove_one)
        batch_proofs.append(proof)
        publics_chain.append([int(p) for p in proof.publics[:8]])

    link, out_map = zkevm_chain_spec(len(batch_proofs[0].publics))
    stack = RecursionStack(engine.air, engine.setup().verkey,
                           n_queries=args.n_queries, link=link,
                           out_map=out_map)

    lifts = [stage(f"recursive1_{k}",
                   lambda k=k: stack.lift(batch_proofs[k]), level=1)
             for k in range(len(batch_proofs))]
    agg01 = stage("aggregate_01",
                  lambda: stack.aggregate(lifts[0], lifts[1]), level=2)
    agg23 = stage("aggregate_23",
                  lambda: stack.aggregate(lifts[2], lifts[3]), level=2)
    root = stage("aggregate_root",
                 lambda: stack.aggregate(agg01, agg23), level=2)
    assert tstage("verify_root", lambda: stack.verify(root))

    out = tstage("finalize_groth16",
                 lambda: stack.finalize(root, wrap="groth16",
                                        rng=random.Random(11)))
    ok = tstage("groth16_verify",
                lambda: groth16.verify(out["vk"], out["proof"],
                                       out["publics"]))
    assert ok
    save(status="complete", verified=True,
         groth16_publics=[str(p) for p in out["publics"]],
         batch_publics_head=publics_chain)
    print("[a7] COMPLETE ->", args.out, flush=True)


if __name__ == "__main__":
    main()
