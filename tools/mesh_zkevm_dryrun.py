"""Mesh dry run of the REAL zkEVM composite AIR (child process).

Builds the fork_9 composite at 2^14 rows (8-bit arith limbs so the range
tables fit), executes a synthetic one-block batch through the real ROM,
proves it over an n-device mesh, natively verifies, and byte-compares
against the single-device proof.  Invoked by __graft_entry__.
dryrun_multichip in a subprocess because XLA's CPU collective rendezvous
aborts the whole process when a virtual-device thread stalls >40 s.

Usage: python tools/mesh_zkevm_dryrun.py [n_devices]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={n_devices}")
    # On the CPU backend the mesh proof runs the HYBRID pipeline (host
    # expression evaluation + sharded structural stages): XLA:CPU
    # executes the traced zkEVM constraint mega-fusions pathologically
    # slowly (~30 CPU-min for ONE per-lookup graph at 2^14 — measured
    # r5), and its hardcoded 40 s collective-rendezvous abort kills any
    # run that overlaps such a compile with an in-flight collective
    # (the r4 failure).  Do NOT force XLAYER_PROVER_JIT_ROUNDS here.
    # Strict compile/execute serialization stays on as a belt: no
    # dispatch overlaps a compile (utils/sync.py).
    os.environ.setdefault("XLAYER_PROVER_SYNC_DISPATCH", "1")
    import jax
    # MUST run before any device query: the first backend touch pins the
    # platform (a later switch silently keeps e.g. the axon TPU plugin)
    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.device_count() >= n_devices

    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.storage_rom import StorageRom
    from xlayer_prover_tpu.parallel import pipeline
    from xlayer_prover_tpu.prover_service import BatchProver
    from xlayer_prover_tpu.stark import prover, verifier
    from xlayer_prover_tpu.state.datastream import (batch_to_l2_data,
                                                    datastream2batch)
    from xlayer_prover_tpu.state.witness import witness2db
    from xlayer_prover_tpu.utils import devnet

    t0 = time.time()
    rom = Rom.load_fork(9)
    srom = StorageRom.load_default()
    engine = BatchProver(rom, n_bits=14, chunk_bits=4, limb_bits=8,
                         n_queries=4, max_steps=1 << 13, storage_rom=srom)
    print(f"zkevm air: cm1={engine.air.cm1_width} "
          f"cm2={engine.air.cm2_width} cm3={engine.air.cm3_width} "
          f"const={engine.air.const_width} built {time.time()-t0:.1f}s",
          flush=True)
    setup = engine.setup()
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    # a real (synthetic, empty-block) batch through the real fork_9 ROM
    a1 = devnet.address_of(0xA11CE)
    g = devnet.build_genesis([devnet.Account(address=a1, balance=10 ** 18)])
    wres = witness2db(devnet.encode_witness(g))
    batch = datastream2batch(devnet.encode_datastream(
        batch_number=1, chain_id=1001, fork_id=9, coinbase=a1,
        blocks=[{"block_number": 1, "timestamp": 100,
                 "delta_timestamp": 100, "l1_info_tree_index": 0,
                 "txs": []}]))
    inp = BatchInput(old_state_root=wres.state_root, chain_id=1001,
                     fork_id=9, batch_l2_data=batch_to_l2_data(batch),
                     sequencer_addr=a1, timestamp_limit=200)
    inp.db_raw = dict(wres.db)
    inp.programs_raw = dict(wres.programs)
    res = engine.execute_only(inp, batch_uuid="mesh-dryrun")
    print(f"executor: {res.ctx.counters.steps} steps "
          f"{time.time()-t0:.1f}s", flush=True)

    mesh = pipeline.make_mesh(n_devices)
    t1 = time.time()
    proof_mesh = prover.gen_proof(setup, res.cm1_np, res.publics,
                                  mesh=mesh)
    print(f"mesh proof {time.time()-t1:.1f}s", flush=True)
    assert verifier.verify(engine.air, setup.verkey, proof_mesh)
    t1 = time.time()
    proof_single = prover.gen_proof(setup, res.cm1_np, res.publics)
    print(f"single proof {time.time()-t1:.1f}s", flush=True)
    assert proof_mesh.to_json() == proof_single.to_json(), \
        "mesh proof != single-device proof"
    # measurement conditions in the tail: mesh timings on this box vary
    # up to ~2x with host contention (the r2->r3 "regression" was load
    # from concurrent proof jobs, not a code change), so every record
    # carries the load it ran under
    print(f"zkevm mesh dryrun OK: byte-equal, total {time.time()-t0:.1f}s "
          f"loadavg={os.getloadavg()} ncpu={os.cpu_count()}", flush=True)


if __name__ == "__main__":
    main()
