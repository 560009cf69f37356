"""Benchmark on the real TPU chip: Goldilocks NTT + Poseidon Merkle.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
throughput vs the per-chip speed-of-light estimate for the same op (HBM
bandwidth bound, v5e ~819 GB/s): 1.0 means memory-bound optimal.

Methodology notes (hard-won, see .claude/skills/verify/SKILL.md):
  * repeated identical dispatches get elided/cached by the remote runtime,
    so every rep feeds its output back into the next (serial data chain);
  * block_until_ready over the tunnel can ack before remote completion, so a
    tiny forcing device->host pull runs under a watchdog thread per timed
    section: if it completes, timings are execution-forced ("forced": true);
    if the tunnel transfer path is wedged (a known failure mode) the
    async-dispatch timings are reported with "forced": false.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_TRANSFER_PROBE = """
import time, jax, jax.numpy as jnp, numpy as np
x = jnp.arange(16, dtype=jnp.uint32) + 1
jax.block_until_ready(x)
t0 = time.perf_counter()
h = jax.device_get(x)
print("RTT", time.perf_counter() - t0)
"""


def _tunnel_transfers_work(timeout_s: float = 120.0):
    """Probe device->host transfers in a subprocess (they can hang holding
    the GIL in-process when the tunnel's transfer path is wedged).
    Returns (ok, rtt_seconds_or_None)."""
    try:
        out = subprocess.run([sys.executable, "-c", _TRANSFER_PROBE],
                             capture_output=True, text=True,
                             timeout=timeout_s, cwd=os.path.dirname(
                                 os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return False, None
    for line in out.stdout.splitlines():
        if line.startswith("RTT"):
            return True, float(line.split()[1])
    return False, None


def _forced_pull(arr, ok: bool):
    """Disabled: in-process pulls can hang indefinitely even when a fresh
    subprocess's transfers succeed (per-session tunnel state).  The probe
    result is reported as metadata instead; timings are async-dispatch."""
    return False, None


def main():
    import jax

    from xlayer_prover_tpu.fields import gl
    from xlayer_prover_tpu.ops import merkle, ntt, poseidon_gl

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    reps = 8
    tunnel_ok, _probe_rtt = _tunnel_transfers_work()

    # --- NTT: 2^20 x 4 columns -----------------------------------------
    n_bits, n_cols = 20, 4
    n = 1 << n_bits
    x = gl.from_u64_np(rng.integers(0, gl.P, size=(n, n_cols), dtype=np.uint64))

    @jax.jit
    def ntt_step(v):
        return ntt.ntt(v, n_bits)

    tiny = jax.jit(lambda v: (v[0, 0] & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))

    x = ntt_step(x)
    jax.block_until_ready(x)            # compile + warm
    _, rtt = _forced_pull(tiny(x), tunnel_ok)   # transfer RTT baseline
    t0 = time.perf_counter()
    for _ in range(reps):
        x = ntt_step(x)                 # serial chain defeats result caching
    jax.block_until_ready(x)
    forced, _ = _forced_pull(tiny(x), tunnel_ok)
    elapsed = time.perf_counter() - t0
    if forced and rtt:
        elapsed = max(elapsed - rtt, 1e-9)
    dt = elapsed / reps
    elems = n * n_cols
    ntt_eps = elems / dt
    bytes_moved = (n_bits + 1) * elems * 8 * 2  # r+w 8B/elem per stage+gather
    sol_eps = elems / (bytes_moved / 819e9)

    # --- Poseidon Merkle leaves: 2^16 x 8 -------------------------------
    m_bits, m_cols = 16, 8
    m = 1 << m_bits
    y = gl.from_u64_np(rng.integers(0, gl.P, size=(m, m_cols), dtype=np.uint64))

    @jax.jit
    def hash_step(rows, digest):
        rows = rows.at[:, :4].set(gl.add(rows[:, :4], digest))
        return rows, poseidon_gl.linear_hash(rows, m_cols)

    tiny_d = jax.jit(lambda v: (v[0, 0] & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    y, d = hash_step(y, gl.zeros((m, 4)))
    jax.block_until_ready(d)
    _forced_pull(tiny_d(d), tunnel_ok)
    t0 = time.perf_counter()
    for _ in range(reps):
        y, d = hash_step(y, d)
    jax.block_until_ready(d)
    forced_h, _ = _forced_pull(tiny_d(d), tunnel_ok)
    elapsed_h = time.perf_counter() - t0
    if forced_h and rtt:
        elapsed_h = max(elapsed_h - rtt, 1e-9)
    dt_m = elapsed_h / reps
    hashes_per_s = m / dt_m

    # --- full merkle tree build (jitted, timed on 2nd call) -------------
    y2 = gl.from_u64_np(rng.integers(0, gl.P, size=(m, m_cols), dtype=np.uint64))

    @jax.jit
    def tree_root(v):
        return merkle._build_levels(v, m_cols)[-1]

    jax.block_until_ready(tree_root(y))
    t0 = time.perf_counter()
    jax.block_until_ready(tree_root(y2))
    dt_tree = time.perf_counter() - t0

    # --- zkEVM executor (host): real fork_9 ROM on a testvector ---------
    executor_steps_per_s = None
    try:
        import os
        vec = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"
        if os.path.exists(vec):
            from xlayer_prover_tpu.executor import rom_functions as rf
            from xlayer_prover_tpu.executor.input import BatchInput
            from xlayer_prover_tpu.executor.main_sm import Context, MainExecutor
            from xlayer_prover_tpu.executor.rom import Rom
            from xlayer_prover_tpu.state.hashdb import HashDB
            rom = Rom.load(
                "/root/reference/src/main_sm/fork_9/scripts/rom.json")
            ex = Rom and MainExecutor(rom, max_steps=1 << 22)
            rf.register_all(ex)
            inp = BatchInput.load(vec)
            hdb = HashDB()
            inp.load_db(hdb)
            ctx = Context(rom, hdb, input_vars=inp.input_vars())
            inp.setup_registers(ctx)
            t0 = time.perf_counter()
            ex.execute(ctx)
            executor_steps_per_s = round(
                ctx.counters.steps / (time.perf_counter() - t0))
    except Exception:
        pass

    line = {
        "metric": "goldilocks_ntt_2e20x4_throughput",
        "value": round(ntt_eps / 1e6, 2),
        "unit": "Melems/s/chip",
        "vs_baseline": round(ntt_eps / sol_eps, 4),
        "poseidon_Mhashes_per_s": round(hashes_per_s / 1e6, 3),
        "ntt_ms": round(dt * 1e3, 3),
        "merkle_tree_2e16_ms": round(dt_tree * 1e3, 2),
        "forced": bool(forced and forced_h),
        "tunnel_transfers_ok": bool(tunnel_ok),
        "executor_steps_per_s": executor_steps_per_s,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
