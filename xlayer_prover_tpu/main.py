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
    ap.add_argument("--rom", default=None)
    ap.add_argument("--prove-toy", action="store_true")
    ap.add_argument("--run-services", action="store_true")
    args = ap.parse_args(argv)

    cfg = Config.load(args.config).check()
    if cfg.json_logs:
        zklog.json_mode = True

    if args.process_batch:
        return cmd_process_batch(cfg, args.process_batch, args.rom)
    if args.prove_toy:
        return cmd_prove_toy(cfg)
    if args.run_services or cfg.run_executor_server or cfg.run_aggregator_client:
        return cmd_run_services(cfg)
    ap.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
