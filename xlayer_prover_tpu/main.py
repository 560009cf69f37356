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

    rom = Rom.load(path) if path else Rom.load_fork(9)
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

    rom = Rom.load(rom_path) if rom_path else Rom.load_fork(9)
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

    rom = Rom.load(rom_path) if rom_path else Rom.load_fork(9)
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
    if cfg.run_hashdb_server:
        from .services.hashdb_service import HashDBServer, HashDBServiceImpl
        if cfg.hashdb64:
            import os
            from .state.hashdb64 import HashDB64
            os.makedirs(cfg.hashdb_folder, exist_ok=True)
            backend = HashDB64(path=os.path.join(cfg.hashdb_folder,
                                                 cfg.hashdb_file_name))
        elif cfg.database_url and cfg.database_url != "local":
            # remote/persistent node store behind the cache stack
            # (reference main.cpp:404-440 DATABASE_USE_CACHE path):
            # postgres DSNs hit PostgresDB, anything else is a sqlite
            # path for SqlDB; both sit under CachedDB (LRU+assoc+
            # MultiWrite write-behind)
            from .state.database import CachedDB, SqlDB
            from .state.hashdb import HashDB as _HashDB
            if cfg.database_url.startswith(("postgres://",
                                            "postgresql://")):
                from .state.postgres import PostgresDB
                sql = PostgresDB(dsn=cfg.database_url)
            else:
                sql = SqlDB(cfg.database_url)
            backend = _HashDB(db=CachedDB(
                backend=sql,
                mt_cache_bytes=cfg.db_mt_cache_mb * (1 << 20),
                program_cache_bytes=cfg.db_program_cache_mb * (1 << 20)))
        else:
            backend = None
        impl = HashDBServiceImpl(backend)
        server = HashDBServer(impl, cfg.hashdb_server_port).start()
        zklog.info(f"hashdb service listening on :{server.port} "
                   f"(backend={'hashdb64' if cfg.hashdb64 else 'classic'})")
        threads.append(server)
        node_db = getattr(impl.hashdb, "db", None)
        if cfg.load_db_to_mem_cache and not cfg.hashdb64 \
                and hasattr(node_db, "read_state_root"):
            # boot-time cache warm start (reference main.cpp:404-440)
            from .state.database import load_db_to_mem_cache
            timeout_s = cfg.load_db_to_mem_timeout_us / 1e6
            if cfg.load_db_to_mem_cache_in_parallel:
                import threading as _th
                _th.Thread(target=load_db_to_mem_cache,
                           args=(node_db,), kwargs={"timeout_s": timeout_s},
                           daemon=True, name="loadDb2MemCache").start()
            else:
                n = load_db_to_mem_cache(node_db, timeout_s=timeout_s)
                zklog.info(f"loadDb2MemCache: warmed {n} nodes")
        if cfg.db_cache_synch_url and not cfg.hashdb64 \
                and hasattr(node_db, "write_cache_only"):
            # mirror a remote prover's flushes into the local caches
            # (reference dbCacheSynchThread, database.cpp:96,1872-1966)
            from .services.hashdb_service import HashDBRemote
            from .state.database import CacheSynchThread
            host, _, port = cfg.db_cache_synch_url.rpartition(":")
            synch = CacheSynchThread(
                node_db, HashDBRemote(host or "localhost", int(port)))
            zklog.info(f"dbCacheSynch -> {cfg.db_cache_synch_url}")
            threads.append(synch)
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


def cmd_script_generators(cfg: Config) -> int:
    """runKeccakScriptGenerator / runSHA256ScriptGenerator
    (main.cpp keccak/sha script dumps): levelize the gate circuit and
    write the script JSON to the configured file slot."""
    import numpy as np

    out = {}
    jobs = []
    if cfg.run_keccak_script_generator:
        jobs.append(("keccak", cfg.keccak_script_file or
                     "keccak_script.json"))
    if cfg.run_sha256_script_generator:
        jobs.append(("sha256", cfg.sha256_script_file or
                     "sha256_script.json"))
    for kind, path in jobs:
        if kind == "keccak":
            from .models.zkevm import keccak_gates as mod
        else:
            from .models.zkevm import sha256_gates as mod
        script = mod.build_script()
        doc = {
            "kind": kind,
            "nInputs": script.n_inputs,
            "nWires": script.n_wires,
            "nGates": script.n_gates,
            "depth": len(script.levels),
            "outputs": [int(w) for w in np.asarray(script.outputs)],
            "program": [{"op": int(op), "a": int(a), "b": int(b),
                         "r": int(r)} for (op, a, b, r) in script.gates],
        }
        with open(path, "w") as f:
            json.dump(doc, f)
        out[kind] = {"file": path, "gates": script.n_gates}
        zklog.info(f"{kind} gate script -> {path} ({script.n_gates} gates)")
    print(json.dumps(out))
    return 0


_SELF_TESTS = {
    # config flag -> pytest targets (the reference's run*Test modes,
    # config.hpp:40-60, map onto the suite's equivalent modules)
    "run_keccak_test": ["tests/test_keccak_gates.py"],
    "run_sha256_test": ["tests/test_sha256_gates.py"],
    "run_storage_sm_test": ["tests/test_storage_executor.py",
                            "tests/test_storage_rom.py"],
    "run_climb_key_sm_test": ["tests/test_storage_rom.py"],
    "run_binary_sm_test": ["tests/test_binary_sm.py"],
    "run_mem_align_sm_test": ["tests/test_mem_align.py",
                              "tests/test_mem_align_air.py"],
    "run_ecrecover_test": ["tests/test_arith_ec.py"],
    "run_database_cache_test": ["tests/test_db_caches.py"],
    "run_database_performance_test": ["tests/test_db_caches.py"],
    "run_check_tree_test": ["tests/test_smt.py"],
    "run_page_manager_test": ["tests/test_page_manager.py"],
    "run_key_value_tree_test": ["tests/test_kv_tree.py"],
    "run_smt64_test": ["tests/test_hashdb64.py"],
    "run_hashdb_test": ["tests/test_hashdb.py", "tests/test_hashdb64.py"],
    "run_blake_test": ["tests/test_blake.py"],
    "run_unit_test": ["tests/"],
}


def cmd_self_tests(cfg: Config) -> int:
    """Dispatch the enabled run*Test flags to their suite modules."""
    import os
    import subprocess

    targets = []
    for flag, mods in _SELF_TESTS.items():
        if getattr(cfg, flag):
            targets.extend(m for m in mods if m not in targets)
    if not targets:
        zklog.warning("no self-test flags enabled")
        return 1
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.call([sys.executable, "-m", "pytest", "-q",
                          "-m", "not slow", *targets], cwd=root)
    return rc


def cmd_executor_client(cfg: Config) -> int:
    """runExecutorClient / runExecutorClientMultithread
    (executor_client.cpp): drive ProcessBatchV2 against a running
    executor service, `executor_client_loops` times per thread."""
    import concurrent.futures as futures

    import grpc

    from .services.executor_service import SERVICE
    from .services.gen import executor_pb2

    if not cfg.input_file:
        zklog.error("executor client needs inputFile")
        return 1
    with open(cfg.input_file) as f:
        data = json.load(f)
    target = f"{cfg.executor_client_host}:{cfg.executor_client_port}"

    def one_run(i: int):
        channel = grpc.insecure_channel(target)
        call = channel.unary_unary(
            f"/{SERVICE}/ProcessBatchV2",
            request_serializer=(
                executor_pb2.ProcessBatchRequestV2.SerializeToString),
            response_deserializer=(
                executor_pb2.ProcessBatchResponseV2.FromString))
        req = executor_pb2.ProcessBatchRequestV2(
            old_state_root=bytes.fromhex(
                data.get("oldStateRoot", "0x" + "00" * 32)[2:]),
            old_acc_input_hash=bytes.fromhex(
                data.get("oldAccInputHash", "0x" + "00" * 32)[2:]),
            batch_l2_data=bytes.fromhex(
                data.get("batchL2Data", "0x")[2:]),
            chain_id=int(data.get("chainID", 1)),
            fork_id=int(data.get("forkID", 9)),
        )
        ok = 0
        for _ in range(max(1, cfg.executor_client_loops)):
            resp = call(req, timeout=120)
            if resp.error == 0:
                ok += 1
        return ok

    n_threads = (cfg.max_executor_threads
                 if cfg.run_executor_client_multithread else 1)
    with futures.ThreadPoolExecutor(max_workers=n_threads) as pool:
        results = list(pool.map(one_run, range(n_threads)))
    print(json.dumps({"threads": n_threads, "ok_responses": sum(results)}))
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
    if cfg.run_keccak_script_generator or cfg.run_sha256_script_generator:
        return cmd_script_generators(cfg)
    if cfg.run_executor_client or cfg.run_executor_client_multithread:
        return cmd_executor_client(cfg)
    if any(getattr(cfg, f) for f in _SELF_TESTS) or cfg.run_blake_test:
        return cmd_self_tests(cfg)
    if args.run_services or cfg.run_executor_server \
            or cfg.run_aggregator_client or cfg.run_hashdb_server:
        return cmd_run_services(cfg)
    ap.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
