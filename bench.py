"""Benchmark on the real TPU chip: Goldilocks NTT, Poseidon, Merkle, and the
proof polynomial pipeline (LDE + Merkleize + FRI fold) at 2^20 x 16 columns.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
throughput vs the per-chip speed-of-light estimate for the same op (HBM
bandwidth bound, v5e ~819 GB/s): 1.0 means memory-bound optimal; values are
sanity-gated so a reading above speed-of-light is reported as unforced.

Methodology (round-2 fix for VERDICT weak-1):
  * all device timing runs in a FRESH SUBPROCESS — in-process device->host
    transfers can wedge on a long-lived tunnel session, but a fresh process'
    transfers work (verified by the round-1 probe), so the child can force
    execution with a real jax.device_get after every timed section;
  * every rep feeds its output back into the next (serial data chain) so
    repeated identical dispatches cannot be elided or cached;
  * each timed section ends with a device_get of an output-dependent scalar,
    making the measured wall-clock cover actual device execution
    ("forced": true).  If the child subprocess fails or times out, the parent
    falls back to in-process async-dispatch timing with "forced": false.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_CHILD_TIMEOUT_S = 1800.0
_JAXCACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jaxcache")


def _device_bench():
    """Runs in the child subprocess: timed device benches, forced."""
    import jax
    # Persistent compilation cache: the axon tunnel compiles remotely and
    # the big Merkle/pipeline graphs take minutes cold; cached reruns
    # dispatch in seconds.
    os.makedirs(_JAXCACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _JAXCACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from xlayer_prover_tpu.fields import gl
    from xlayer_prover_tpu.ops import merkle, ntt, poseidon_gl
    from xlayer_prover_tpu.stark import fri

    rng = np.random.default_rng(0)
    reps = 8

    tiny = jax.jit(lambda v: (v.ravel()[0] & jnp.uint64(0xFFFFFFFF))
                   .astype(jnp.uint32))

    def force(arr):
        """Output-dependent scalar pulled to host: forces execution."""
        return int(jax.device_get(tiny(arr)))

    # Transfer RTT baseline (subtracted from each section once).  The
    # tunnel RTT can reach hundreds of ms, so every section adapts its
    # rep count until compute dominates RTT (>= 10x), instead of trusting
    # a single subtraction.  A wedged tunnel can stretch one probe to
    # minutes (r4 measured 224 s and every subsequent subtraction went
    # negative): probe up to 3 times, take the best, and if even the best
    # exceeds 5 s declare the tunnel wedged so the parent can retry a
    # fresh child instead of timing against garbage.
    probe = jnp.arange(16, dtype=jnp.uint32)
    jax.block_until_ready(probe)
    rtt = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(probe)
        dt_probe = time.perf_counter() - t0
        rtt = dt_probe if rtt is None else min(rtt, dt_probe)
        if rtt < 5.0:
            break
    if rtt >= 5.0:
        print(f"CHILD_WEDGED rtt={rtt:.1f}s", flush=True)
        sys.exit(3)

    out = {"forced": True, "rtt_ms": round(rtt * 1e3, 3)}

    def timed_chain(step, state, min_reps=4, max_reps=512):
        """Serial-chained reps until total >= 10x RTT; returns (dt_per_rep,
        state).  Execution is forced by an output-dependent device_get."""
        reps = min_reps
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                state = step(state)
            force(state[0] if isinstance(state, tuple) else state)
            total = time.perf_counter() - t0
            if total - rtt >= 10 * rtt or reps >= max_reps:
                return max(total - rtt, 1e-9) / reps, state
            scale = max(2, int(10 * rtt / max(total - rtt, 1e-4)))
            reps = min(max_reps, reps * scale)

    def partial():
        # emit progress so the parent can use completed sections even if a
        # later section wedges the transfer path
        print("CHILD_PARTIAL " + json.dumps(out), flush=True)

    # --- NTT: 2^20 x 4 columns -----------------------------------------
    n_bits, n_cols = 20, 4
    n = 1 << n_bits
    x = gl.from_u64_np(rng.integers(0, gl.P, size=(n, n_cols), dtype=np.uint64))

    ntt_step = jax.jit(lambda v: ntt.ntt(v, n_bits))
    x = ntt_step(x)
    force(x)                               # compile + warm + force
    dt, x = timed_chain(ntt_step, x)       # serial chain defeats caching
    elems = n * n_cols
    ntt_eps = elems / dt
    bytes_moved = (n_bits + 1) * elems * 8 * 2   # r+w per stage + gather
    sol_eps = elems / (bytes_moved / 819e9)
    out["ntt_ms"] = round(dt * 1e3, 3)
    out["ntt_Melems_per_s"] = round(ntt_eps / 1e6, 2)
    out["ntt_vs_sol"] = round(ntt_eps / sol_eps, 4)
    partial()

    # --- Poseidon linear hash: 2^16 x 8 --------------------------------
    m_bits, m_cols = 16, 8
    m = 1 << m_bits
    y = gl.from_u64_np(rng.integers(0, gl.P, size=(m, m_cols), dtype=np.uint64))

    @jax.jit
    def hash_step(rows, digest):
        rows = rows.at[:, :4].set(gl.add(rows[:, :4], digest))
        return rows, poseidon_gl.linear_hash(rows, m_cols)

    y, d = hash_step(y, gl.zeros((m, 4)))
    force(d)
    dt_m, (y, d) = timed_chain(lambda s: hash_step(*s), (y, d))
    # bandwidth bound kept for r1-r3 continuity; the permutation is
    # compute-bound ~50x over its traffic (docs/POSEIDON_SOL.md) so the
    # honest denominator is the VPU instruction budget: ~128k u32 slots
    # per permutation on 3.85 T slots/s -> 30 Mperm/s.
    POS_COMPUTE_SOL = 30e6
    pos_sol = 819e9 / (12 * 8 * 2)
    pos_rate = m / dt_m
    out["poseidon_Mhashes_per_s"] = round(pos_rate / 1e6, 3)
    out["poseidon_vs_sol"] = round(pos_rate / pos_sol, 4)
    partial()

    # --- Poseidon at production batch: 2^20-row leaf hash ----------------
    # The 2^16 figure above is dispatch-limited on a ~0.5 s-RTT tunnel;
    # Merkle leaf hashing inside a real proof runs millions of rows per
    # dispatch.  This is the rate the compute-SoL ceiling applies to.
    lb_bits = 20
    lb = 1 << lb_bits
    z = gl.from_u64_np(rng.integers(0, gl.P, size=(lb, 8), dtype=np.uint64))

    @jax.jit
    def leaf_step(rows, digest):
        rows = rows.at[:, :4].set(gl.add(rows[:, :4], digest))
        return rows, poseidon_gl.linear_hash(rows, 8)

    z, zd = leaf_step(z, gl.zeros((lb, 4)))
    force(zd)
    dt_l, (z, zd) = timed_chain(lambda s: leaf_step(*s), (z, zd),
                                min_reps=2, max_reps=64)
    leaf_rate = lb / dt_l
    out["poseidon_leaf_2e20_Mhz"] = round(leaf_rate / 1e6, 2)
    out["poseidon_vs_compute_sol"] = round(leaf_rate / POS_COMPUTE_SOL, 4)
    partial()

    # --- Poseidon permutation backend shootout ---------------------------
    # raw (batch, 12) permutes per second for the candidate backends
    # (bit-identical; ops/pallas_poseidon.py).  The production default is
    # flipped to the silicon winner.
    from xlayer_prover_tpu.ops import pallas_poseidon as pp
    pb = 1 << 15
    states = gl.from_u64_np(
        rng.integers(0, gl.P, size=(pb, 12), dtype=np.uint64))
    for name, fn in (("lazy", pp.permute_small_lazy),
                     ("lazy_t", pp.permute_small_lazy_t),
                     ("lazy_mxu", pp.permute_small_lazy_mxu)):
        st = fn(states)
        force(st)
        dt_b, st = timed_chain(fn, st)
        out[f"poseidon_perm_{name}_Mhz"] = round(pb / dt_b / 1e6, 2)
        partial()

    # --- full Merkle tree build 2^16 x 8 --------------------------------
    # a 2^16 tree builds fully on device in one jit (merkle._build_levels;
    # merkelize uses the same graph at this size), so the timed chain
    # feeds the device root back without a host pull per rep
    @jax.jit
    def tree_step(rows):
        root = merkle._build_levels(rows, m_cols)[-1]
        return rows.at[:, :4].set(gl.add(rows[:, :4], root)), root

    _r, _ = tree_step(y)
    force(_r)
    dt_t, _ = timed_chain(lambda s: tree_step(s[0]), (y, None))
    out["merkle_tree_2e16_ms"] = round(dt_t * 1e3, 2)
    partial()

    # --- proof polynomial pipeline: 2^20 x 16, LDE->Merkle->fold ---------
    # The hot loops of Starks::genProof (reference starks.cpp:53-60,229-296,
    # friProve.cpp:20-149): extendPol (INTT + shifted NTT to 2x domain),
    # Poseidon Merkle build over the extended rows, then a FRI-style fold
    # chain down from 2^21.
    p_bits, p_cols = 20, 16
    pn = 1 << p_bits
    cm = gl.from_u64_np(rng.integers(0, gl.P, size=(pn, p_cols),
                                     dtype=np.uint64))

    from xlayer_prover_tpu.fields import gl3

    lde = jax.jit(lambda v: ntt.extend_pol(v, p_bits + 1))
    sx = gl3.from_ints(7, 0, 0)

    def pipeline(v):
        ext = lde(v)                       # (2^21, 16)
        root = merkle.merkelize(ext, p_cols).root_np()
        folded = tuple(ext[:, k] for k in range(3))  # FRI pol stand-in
        bits = p_bits + 1
        shift_inv = gl.host_inv(gl.SHIFT)
        while bits > 10:
            nxt = max(bits - 4, 10)
            w_inv = gl.host_inv(gl.host_w(bits))
            folded = fri.fold(folded, sx, shift_inv, w_inv, bits, nxt)
            for _ in range(bits - nxt):
                shift_inv = (shift_inv * shift_inv) % gl.P
            bits = nxt
        return root, folded

    root, folded = pipeline(cm)
    force(folded[0])                       # compile + warm (root: host np)
    cm2 = gl.add(cm, gl.full(cm.shape, 3))
    t0 = time.perf_counter()
    root, folded = pipeline(cm2)
    force(folded[0])
    dt_p = max(time.perf_counter() - t0 - 2 * rtt, 1e-9)
    out["pipeline_2e20x16_ms"] = round(dt_p * 1e3, 1)
    # bandwidth-only line kept for r1-r3 continuity: LDE touches
    # 2^20*16 + 2^21*16 elems (r+w through log stages), merkle ~2^21 rows
    # hashed, folds touch ~2^21*3*4/3.
    pipe_bytes = (p_bits + 2) * (pn * 2 * p_cols) * 8 * 2
    out["pipeline_vs_sol"] = round((pipe_bytes / 819e9) / dt_p, 4)
    # component-wise compute SoL (docs/POSEIDON_SOL.md): the Merkle build
    # is Poseidon-compute-bound (16-wide leaves = 2 perms/row + 1 perm/node
    # over 2^21 ext rows), LDE + folds are HBM-bound.
    pipe_perms = 3 * (pn * 2)
    lde_bytes = (p_bits + 2) * (pn * 3 * p_cols) * 8 * 2
    fold_bytes = (pn * 2) * 3 * 8 * 2 * 2
    pipe_sol_s = pipe_perms / POS_COMPUTE_SOL \
        + (lde_bytes + fold_bytes) / 819e9
    out["pipeline_vs_compute_sol"] = round(pipe_sol_s / dt_p, 4)

    print("CHILD_RESULT " + json.dumps(out))


def _run_child_once():
    env = dict(os.environ)
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-child"],
            capture_output=True, text=True, timeout=_CHILD_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
    except subprocess.TimeoutExpired as te:
        stdout = te.stdout.decode() if isinstance(te.stdout, bytes) else \
            (te.stdout or "")
        result = None
        for line in stdout.splitlines():
            if line.startswith("CHILD_PARTIAL ") or \
                    line.startswith("CHILD_RESULT "):
                result = json.loads(line.split(" ", 1)[1])
        return result, False
    wedged = any(line.startswith("CHILD_WEDGED")
                 for line in res.stdout.splitlines())
    final = None
    last_partial = None
    for line in res.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            final = json.loads(line[len("CHILD_RESULT "):])
        elif line.startswith("CHILD_PARTIAL "):
            last_partial = json.loads(line[len("CHILD_PARTIAL "):])
    result = final or last_partial
    if final is None and not wedged:
        # the child died (crash or timeout) after its last partial: never
        # swallow the traceback — a silent partial reads as "wedged"
        # when the truth may be a bug (this hid a fold-call crash for a
        # whole round)
        sys.stderr.write(res.stderr[-2000:] + "\n")
        if result is not None:
            result["child_died"] = True
    return result, wedged


def _run_child():
    """Device bench in a fresh subprocess; one retry on a wedged tunnel
    (a fresh child's transfers often work when a long-lived session's
    don't — and a >5 s RTT means the measurement would be garbage)."""
    result, wedged = _run_child_once()
    if wedged:
        sys.stderr.write("bench: tunnel wedged (RTT probe > 5 s); "
                         "retrying one fresh child\n")
        result, wedged = _run_child_once()
        if wedged:
            return None
    return result


_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LAST.json")


def _load_cached():
    """Last successful device measurement (the axon tunnel wedges for
    stretches; a stale-but-forced number beats a hang or a lie)."""
    try:
        with open(_CACHE_PATH) as f:
            dev = json.load(f)
        dev["cached"] = True
        return dev
    except Exception:  # noqa: BLE001
        return None


def _fallback_inprocess():
    """Async-dispatch timing (unforced) if the child fails."""
    import jax
    from xlayer_prover_tpu.fields import gl
    from xlayer_prover_tpu.ops import ntt

    rng = np.random.default_rng(0)
    n_bits, n_cols = 20, 4
    n = 1 << n_bits
    x = gl.from_u64_np(rng.integers(0, gl.P, size=(n, n_cols), dtype=np.uint64))
    ntt_step = jax.jit(lambda v: ntt.ntt(v, n_bits))
    x = ntt_step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(8):
        x = ntt_step(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / 8
    elems = n * n_cols
    bytes_moved = (n_bits + 1) * elems * 8 * 2
    sol_eps = elems / (bytes_moved / 819e9)
    return {"forced": False, "ntt_ms": round(dt * 1e3, 3),
            "ntt_Melems_per_s": round(elems / dt / 1e6, 2),
            "ntt_vs_sol": round((elems / dt) / sol_eps, 4)}


def _executor_bench():
    """Host-side zkEVM executor throughput on a real fork_9 testvector.

    Returns (steps_per_s, path) where path records which executor core
    actually ran ("native" = libnexec.so, "python" = the interpreter) —
    r4 silently measured the Python interpreter because the untracked
    native lib wasn't built (VERDICT r4 weak-3); the lib is now built
    here before measuring."""
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        subprocess.run(["bash", os.path.join(repo, "tools",
                                             "build_native.sh")],
                       capture_output=True, timeout=300)
    except Exception:  # noqa: BLE001
        pass
    vec = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"
    try:
        from xlayer_prover_tpu.executor import rom_functions as rf
        from xlayer_prover_tpu.executor.input import BatchInput
        from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
        from xlayer_prover_tpu.executor.rom import Rom
        from xlayer_prover_tpu.state.hashdb import HashDB
        rom = Rom.load_fork(9)      # vendored bundle (data/roms)
        path = "python"
        try:
            from xlayer_prover_tpu.executor.nexec import (NativeMainExecutor,
                                                          available)
            if available():
                ex = NativeMainExecutor(rom, max_steps=1 << 22)
                rf.register_all(ex.py)
                path = "native"
            else:
                raise ImportError
        except Exception:
            ex = MainExecutor(rom, max_steps=1 << 22)
            rf.register_all(ex)
        if os.path.exists(vec):
            inp = BatchInput.load(vec)
        else:
            # reference not mounted: a synthetic devnet batch through the
            # same ROM (fewer steps, same interpreter loop)
            from xlayer_prover_tpu.state.datastream import (batch_to_l2_data,
                                                            datastream2batch)
            from xlayer_prover_tpu.state.witness import witness2db
            from xlayer_prover_tpu.utils import devnet
            a1 = devnet.address_of(0xA11CE)
            g = devnet.build_genesis(
                [devnet.Account(address=a1, balance=10 ** 18)])
            wres = witness2db(devnet.encode_witness(g))
            batch = datastream2batch(devnet.encode_datastream(
                batch_number=1, chain_id=1001, fork_id=9, coinbase=a1,
                blocks=[{"block_number": 1, "timestamp": 100,
                         "delta_timestamp": 100, "l1_info_tree_index": 0,
                         "txs": []}]))
            inp = BatchInput(old_state_root=wres.state_root, chain_id=1001,
                             fork_id=9,
                             batch_l2_data=batch_to_l2_data(batch),
                             sequencer_addr=a1, timestamp_limit=200)
            inp.db_raw = dict(wres.db)
            inp.programs_raw = dict(wres.programs)

        def one_run():
            hdb = HashDB()
            inp.load_db(hdb)
            ctx = Context(rom, hdb, input_vars=inp.input_vars())
            inp.setup_registers(ctx)
            t0 = time.perf_counter()
            ex.execute(ctx)
            return ctx.counters.steps / (time.perf_counter() - t0)

        # Steady-state throughput: the reference's generated executor is a
        # long-lived process (ROM pre-decoded once); time warm runs, take
        # the best of 3 to shed scheduler noise.
        one_run()  # warm: lazy pre-decode + allocator warmup
        return round(max(one_run() for _ in range(3))), path
    except Exception:
        return None, None


def _sanity_gate(dev):
    """Drop any section whose measured rate exceeds its physical ceiling
    (execution wasn't captured) and say whether the remaining headline is
    trustworthy.  Runs BEFORE the cache write — r4's wedge wrote 2e12
    'Melems/s' into BENCH_LAST.json because the gate ran after."""
    sane = True
    if dev.get("ntt_vs_sol", 0) > 1.5 or dev.get("ntt_ms", 1) <= 0:
        sane = False
    for k, gate in (("poseidon_vs_sol", "poseidon_Mhashes_per_s"),
                    ("pipeline_vs_sol", "pipeline_2e20x16_ms"),
                    ("poseidon_vs_compute_sol", "poseidon_leaf_2e20_Mhz")):
        if dev.get(k, 0) > 1.5:
            dev.pop(gate, None)
            dev.pop(k, None)
            sane = False
    # shootout lines have no per-line vs_sol: gate on the compute SoL
    # ceiling for the 12-wide permutation (~30 Mperm/s, POSEIDON_SOL.md)
    for k in ("poseidon_perm_lazy_Mhz", "poseidon_perm_lazy_t_Mhz",
              "poseidon_perm_lazy_mxu_Mhz"):
        if dev.get(k, 0) > 45:
            dev.pop(k, None)
            sane = False
    return sane


def main():
    dev = _run_child()
    forced = dev is not None and dev.get("forced", False)
    if dev is not None and not _sanity_gate(dev):
        forced = False
    if dev is not None and forced:
        # only a gate-clean forced measurement may become the fallback
        # cache (r4's wedge poisoned it; VERDICT r4 weak-1)
        try:
            with open(_CACHE_PATH, "w") as f:
                json.dump(dev, f)
        except Exception:  # noqa: BLE001
            pass
    if dev is None:
        dev = _load_cached()
        if dev is not None and not _sanity_gate(dev):
            dev = None
        # A cache hit is stale by definition: never publish it as a fresh
        # forced measurement (VERDICT r2 weak-3).
        forced = False
    if dev is None:
        dev = _fallback_inprocess()
        _sanity_gate(dev)
        forced = False

    line = {
        "metric": "goldilocks_ntt_2e20x4_throughput",
        "value": dev.get("ntt_Melems_per_s"),
        "unit": "Melems/s/chip",
        "vs_baseline": dev.get("ntt_vs_sol"),
        "forced": bool(forced),
    }
    if dev.get("cached"):
        line["cached"] = True
    if "pipeline_2e20x16_ms" not in dev:
        # The pipeline section (the number that matters most) never
        # reported — say so instead of silently dropping it.
        line["pipeline_wedged"] = True
    if dev.get("child_died"):
        line["child_died"] = True
    # every extra is published only from a forced, gate-clean measurement
    # (r4 published unforced garbage extras; VERDICT r4 weak-1)
    if forced:
        for k in ("ntt_ms", "poseidon_Mhashes_per_s", "poseidon_vs_sol",
                  "poseidon_leaf_2e20_Mhz", "poseidon_vs_compute_sol",
                  "poseidon_perm_lazy_Mhz", "poseidon_perm_lazy_t_Mhz",
                  "poseidon_perm_lazy_mxu_Mhz",
                  "merkle_tree_2e16_ms", "pipeline_2e20x16_ms",
                  "pipeline_vs_sol", "pipeline_vs_compute_sol", "rtt_ms"):
            if k in dev:
                line[k] = dev[k]
    exec_rate, exec_path = _executor_bench()
    line["executor_steps_per_s"] = exec_rate
    line["executor_path"] = exec_path
    print(json.dumps(line))


if __name__ == "__main__":
    if "--device-child" in sys.argv:
        _device_bench()
    else:
        main()
