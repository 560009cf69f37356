"""Strict compile/execute serialization for CPU-mesh collectives.

XLA's CPU collective rendezvous hard-aborts the whole process when the
per-device partition threads of a dispatched collective do not all arrive
within a hardcoded 40 s window (xla/service/rendezvous.cc — no flag exposes
the timeout).  On a small host, a concurrent multi-minute XLA compile starves
those threads, so ANY overlap of compilation with an in-flight collective
execution is fatal.  JAX's async dispatch creates exactly that overlap: the
next call's trace+compile starts while the previous executable is still
running its collectives.

With XLAYER_PROVER_SYNC_DISPATCH=1 the prover (a) AOT-compiles every graph of
a fan-out BEFORE the first dispatch (compilation only — no collective can be
in flight), and (b) blocks until ready after every dispatch, so at most one
executable is ever in flight and never concurrently with a compile.  This
trades pipelining for survival on oversubscribed CPU meshes; real TPU
backends never set it.
"""

from __future__ import annotations

import os


def compile_workers(default: int = 8) -> int:
    """Concurrency for warm-compile thread pools (XLAYER_PROVER_COMPILE_WORKERS).

    Each in-flight compile of a multi-MB MLIR module costs the compile
    helper GBs of peak RSS; on a host already holding large proof state,
    8-way pools can OOM-kill the helper (SIGKILL -> remote_compile HTTP
    500).  Long-running proof drivers set this to 1-2."""
    try:
        return max(1, int(os.environ.get(
            "XLAYER_PROVER_COMPILE_WORKERS", str(default))))
    except ValueError:
        return default


def sync_dispatch_enabled() -> bool:
    return os.environ.get("XLAYER_PROVER_SYNC_DISPATCH", "") \
        not in ("", "0", "false", "no")


def sync(x):
    """Block until `x` (any pytree of arrays) is ready, iff sync mode."""
    if sync_dispatch_enabled():
        import jax
        jax.block_until_ready(x)
    return x


def aot_warm(fns, args, max_workers: int | None = None):
    """AOT-compile jitted `fns` for concrete `args`; returns callables.

    Blocks on `args` first so no prior execution overlaps the compiles,
    then compiles in parallel (pure compilation dispatches nothing).  In
    normal (non-sync) mode returns `fns` unchanged."""
    if not sync_dispatch_enabled():
        return fns
    import jax
    from concurrent.futures import ThreadPoolExecutor
    jax.block_until_ready(args)
    if max_workers is None:
        max_workers = min(4, compile_workers())
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(lambda fn: fn.lower(*args).compile(), fns))
