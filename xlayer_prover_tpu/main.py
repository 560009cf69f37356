"""Process driver (reference: src/main.cpp): config, services, file runs.

Modes (mirroring the reference's config-driven entry points):
  * --process-batch INPUT.json   execute a batch on the zkEVM ROM (fast
                                 path, no proof) and print counters + roots
  * --run-executor-server        start the ExecutorService (gRPC)
  * --run-aggregator-client      connect to an aggregator and serve proofs
  * --prove-toy                  generate + verify a toy-circuit proof
                                 (the standalone STARK harness pattern,
                                 test/prover/main.cpp:6-30)

Usage: python -m xlayer_prover_tpu.main [-c config.json] MODE...
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from .utils.config import Config
from .utils.log import zklog


def _load_rom(path: str | None):
    from .executor import rom_functions as rf
    from .executor.main_sm import MainExecutor
    from .executor.rom import Rom

    rom_path = path or "/root/reference/src/main_sm/fork_9/scripts/rom.json"
    rom = Rom.load(rom_path)
    ex = MainExecutor(rom, max_steps=1 << 23)
    rf.register_all(ex)
    return rom, ex


def cmd_process_batch(cfg: Config, input_path: str, rom_path=None) -> int:
    from .executor.input import BatchInput
    from .executor.main_sm import Context, MainExecutor
    from .state.hashdb import HashDB

    rom, ex = _load_rom(rom_path)
    inp = BatchInput.load(input_path)
    hashdb = HashDB()
    inp.load_db(hashdb)
    ctx = Context(rom, hashdb, input_vars=inp.input_vars())
    inp.setup_registers(ctx)
    t0 = time.perf_counter()
    ex.execute(ctx)
    dt = time.perf_counter() - t0
    sr = MainExecutor._root_quad(ctx.regs.SR)
    new_root = sr[0] | (sr[1] << 64) | (sr[2] << 128) | (sr[3] << 192)
    out = {
        "steps": ctx.counters.steps,
        "binary": ctx.counters.binary,
        "arith": ctx.counters.arith,
        "keccak_f": ctx.counters.keccak_f,
        "poseidon_g": ctx.counters.poseidon_g,
        "storage_ops": len(ctx.required.storage),
        "new_state_root": hex(new_root),
        "seconds": round(dt, 3),
        "steps_per_s": round(ctx.counters.steps / dt),
    }
    print(json.dumps(out))
    return 0


def cmd_prove_toy(cfg: Config) -> int:
    import numpy as np

    from .models.toy import fib
    from .stark import prover, verifier

    air = fib.build_air(n_bits=5, n_queries=8)
    const_np, cm1_np, publics = fib.gen_trace(air)
    setup = prover.Setup.build(air, const_np)
    t0 = time.perf_counter()
    proof = prover.gen_proof(setup, cm1_np, publics)
    t1 = time.perf_counter()
    verifier.verify(air, setup.verkey, proof)
    t2 = time.perf_counter()
    print(json.dumps({"prove_s": round(t1 - t0, 3),
                      "verify_s": round(t2 - t1, 3),
                      "proof_bytes": len(proof.to_json()),
                      "verified": True}))
    return 0


def cmd_gen_batch_proof(cfg: Config, input_path: str, rom_path=None,
                        n_bits: int = 16) -> int:
    """runFileGenBatchProof (reference main.cpp:594-701): prove a saved
    batch input end-to-end, optionally dumping the committed trace
    (zkevmCmPolsAfterExecutor) and the proof JSON."""
    from .executor.input import BatchInput
    from .executor.rom import Rom
    from .prover_service import BatchProver
    from .stark import verifier

    rom = Rom.load(rom_path
                   or "/root/reference/src/main_sm/fork_9/scripts/rom.json")
    engine = BatchProver(rom, n_bits=n_bits, max_steps=1 << 22)
    inp = BatchInput.load(input_path)
    t0 = time.perf_counter()
    res = engine.execute_only(inp)
    t1 = time.perf_counter()
    if cfg.zkevm_cm_pols_file:
        BatchProver.save_cm_pols(cfg.zkevm_cm_pols_file, res)
        zklog.info(f"saved committed trace to {cfg.zkevm_cm_pols_file}")
    engine.setup(cfg.zkevm_constants_tree)   # preload/persist const tree
    proof = engine.prove_from_trace(res.cm1_np, res.publics)
    t2 = time.perf_counter()
    verifier.verify(engine.air, engine.setup().verkey, proof)
    out = {"execute_s": round(t1 - t0, 3), "prove_s": round(t2 - t1, 3),
           "steps": res.ctx.counters.steps, "verified": True}
    if cfg.save_proof_to_file:
        dest = (cfg.save_proofs_dir or ".") + "/batch_proof.json"
        with open(dest, "w") as f:
            f.write(proof.to_json())
        out["proof_file"] = dest
    print(json.dumps(out))
    return 0


def cmd_prove_from_cmpols(cfg: Config, path: str, rom_path=None,
                          n_bits: int = 16) -> int:
    """Resume proving from a saved committed trace without re-executing
    (the reference's mmap'd zkevmCmPols re-run)."""
    from .executor.rom import Rom
    from .prover_service import BatchProver
    from .stark import verifier

    rom = Rom.load(rom_path
                   or "/root/reference/src/main_sm/fork_9/scripts/rom.json")
    engine = BatchProver(rom, n_bits=n_bits, max_steps=1 << 22)
    cm1, publics = BatchProver.load_cm_pols(path)
    engine.setup(cfg.zkevm_constants_tree)   # preload/persist const tree
    t0 = time.perf_counter()
    proof = engine.prove_from_trace(cm1, publics)
    t1 = time.perf_counter()
    verifier.verify(engine.air, engine.setup().verkey, proof)
    print(json.dumps({"prove_s": round(t1 - t0, 3), "verified": True}))
    return 0


def cmd_run_services(cfg: Config) -> int:
    from .executor.executor import Executor
    from .prover_service import ProverService
    from .services.executor_service import ExecutorServer, ExecutorServiceImpl
    from .state.hashdb import HashDB

    threads = []
    if cfg.run_executor_server:
        rom, ex_machine = _load_rom(None)
        executor = Executor.__new__(Executor)
        executor.rom = rom
        executor.main = ex_machine
        impl = ExecutorServiceImpl(executor, HashDB())
        server = ExecutorServer(impl, cfg.executor_server_port).start()
        zklog.info(f"executor service listening on :{server.port}")
        threads.append(server)
    if cfg.run_aggregator_client:
        from .services.aggregator import AggregatorClient
        prover_svc = ProverService({})
        client = AggregatorClient(prover_svc, cfg.aggregator_client_host,
                                  cfg.aggregator_client_port,
                                  prover_name=cfg.prover_name,
                                  fork_id=cfg.fork_id)
        client.start()
        zklog.info(f"aggregator client -> {client.target}")
        threads.append(client)
    if not threads:
        zklog.warning("no services enabled in config")
        return 1
    try:
        while True:
            time.sleep(1.0)
    except KeyboardInterrupt:
        for t in threads:
            t.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="xlayer-prover-tpu")
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--process-batch", metavar="INPUT_JSON")
    ap.add_argument("--gen-batch-proof", metavar="INPUT_JSON")
    ap.add_argument("--prove-from-cmpols", metavar="CMPOLS_NPZ")
    ap.add_argument("--n-bits", type=int, default=16)
    ap.add_argument("--rom", default=None)
    ap.add_argument("--prove-toy", action="store_true")
    ap.add_argument("--run-services", action="store_true")
    args = ap.parse_args(argv)

    cfg = Config.load(args.config).check()
    if cfg.json_logs:
        zklog.json_mode = True

    if args.process_batch:
        return cmd_process_batch(cfg, args.process_batch, args.rom)
    if args.gen_batch_proof:
        return cmd_gen_batch_proof(cfg, args.gen_batch_proof, args.rom,
                                   args.n_bits)
    if args.prove_from_cmpols:
        return cmd_prove_from_cmpols(cfg, args.prove_from_cmpols, args.rom,
                                     args.n_bits)
    if args.prove_toy:
        return cmd_prove_toy(cfg)
    if args.run_services or cfg.run_executor_server or cfg.run_aggregator_client:
        return cmd_run_services(cfg)
    ap.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
