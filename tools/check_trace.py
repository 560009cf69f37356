"""Fast host-side trace/constraint checker (debugging aid).

The TPU-native analogue of the reference's polsDiff/zkevmCmPolsAfterExecutor
debug tooling (src/pols_diff/pols_diff.cpp; config.hpp:123): instead of
diffing two 50 GB dumps, it evaluates every AIR constraint directly on a
filled (const, cm1) trace with numpy Goldilocks ops and reports the first
failing rows per constraint — catching witness-fill / constraint-wiring bugs
in seconds instead of a full proof run.

Checks
  * identity constraints vanish on H (cyclic shifts);
  * plookups: with random challenge draws, the compressed-f value set is a
    subset of the compressed-t value set (the exact precondition for the
    h1/h2 split to exist);
  * permutations: compressed-f multiset == compressed-t multiset.

Usage (module):
    from tools.check_trace import check_trace
    failures = check_trace(air, const_np, cm1_np, publics)

CLI: python tools/check_trace.py  — runs the real fork_9 batch with the
Storage SM integrated at a small domain and checks the full trace.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from xlayer_prover_tpu.fields import glh                          # noqa: E402
from xlayer_prover_tpu.stark.air import (Air, BinOp, Challenge,   # noqa: E402
                                         Col, Const,
                                         FirstRowSelector, Public, XSymbol)

P = 0xFFFFFFFF00000001


class _HostEval:
    """Row-wise evaluation of an Expr over the base domain (numpy).

    cm3 im columns (air.im_defs degree-lowering commits) are inlined back
    to their defining expressions so a (const, cm1) trace suffices."""

    def __init__(self, n, const_np, cm1_np, publics, challenges,
                 im_defs=None):
        self.n = n
        self.sections = {"const": const_np, "cm1": cm1_np}
        self.publics = publics
        self.challenges = challenges
        self.im_defs = {col.index: expr for col, expr in (im_defs or [])}
        self._l1 = np.zeros(n, dtype=np.uint64)
        self._l1[0] = 1
        self._cache = {}

    def eval(self, e):
        hit = self._cache.get(id(e))
        if hit is not None and hit[0] is e:
            return hit[1]
        v = self._eval(e)
        self._cache[id(e)] = (e, v)
        return v

    def _eval(self, e):
        if isinstance(e, Col):
            if e.section == "cm3":
                from xlayer_prover_tpu.stark.air import _shift_expr
                expr = self.im_defs.get(e.index)
                if expr is None:
                    raise KeyError(f"cm3 col {e.index} is not an im pol")
                for _ in range(int(e.shift)):
                    expr = _shift_expr(expr)
                return self.eval(expr)
            key = (e.section, e.index, int(e.shift))
            v = self._cache.get(key)
            if v is None:
                arr = self.sections[e.section][:, e.index]
                v = np.roll(arr, -int(e.shift)) if e.shift else arr
                self._cache[key] = v
            return v
        if isinstance(e, Const):
            return np.uint64(e.value % P)
        if isinstance(e, Challenge):
            return np.uint64(self.challenges[e.index])
        if isinstance(e, Public):
            return np.uint64(self.publics[e.index] % P)
        if isinstance(e, FirstRowSelector):
            return self._l1
        if isinstance(e, XSymbol):
            raise NotImplementedError("XSymbol only used by connections")
        if isinstance(e, BinOp):
            a = self.eval(e.a)
            b = self.eval(e.b)
            if e.op == "add":
                return glh.add(a, b)
            if e.op == "sub":
                return glh.sub(a, b)
            return glh.mul(a, b)
        raise TypeError(type(e))


ALL_SECTIONS = ("identity", "plookup", "permutation", "connection")


def check_trace(air: Air, const_np, cm1_np, publics, verbose=True,
                seed=0xC0FFEE, sections=ALL_SECTIONS, stop_at_first=False):
    """Returns a list of failure descriptions (empty = trace satisfies
    everything checkable host-side).  `sections` selects which constraint
    families to evaluate — tamper-negative tests that assert on a single
    family (e.g. a plookup break) pass just that one and skip the rest of
    the 2^16-row sweep; `stop_at_first` returns on the first failure
    (negatives only assert non-emptiness)."""
    rng = np.random.default_rng(seed)
    challenges = [int(rng.integers(1, 1 << 62)) for _ in range(8)]
    ev = _HostEval(air.n, const_np, cm1_np, list(publics or []), challenges,
                   im_defs=getattr(air, "im_defs", None))
    failures = []

    for i, c in enumerate(air.constraints if "identity" in sections else ()):
        vals = ev.eval(c)
        if np.isscalar(vals) or vals.ndim == 0:
            bad = [] if int(vals) == 0 else [0]
        else:
            bad = np.nonzero(vals)[0][:5].tolist()
        if bad:
            failures.append(f"identity[{i}] fails at rows {bad}")
            if verbose:
                print(failures[-1], flush=True)
            if stop_at_first:
                return failures

    for i, pu in enumerate(air.plookups if "plookup" in sections else ()):
        f = np.asarray(ev.eval(pu.f_exp)) + np.zeros(air.n, dtype=np.uint64)
        t = np.asarray(ev.eval(pu.t_exp)) + np.zeros(air.n, dtype=np.uint64)
        missing = ~np.isin(f, t)
        if missing.any():
            rows = np.nonzero(missing)[0][:5].tolist()
            failures.append(f"plookup[{i}]: f rows {rows} not found in t")
            if verbose:
                print(failures[-1], flush=True)
            if stop_at_first:
                return failures

    for i, pe in enumerate(air.permutations if "permutation" in sections
                           else ()):
        f = np.asarray(ev.eval(pe.f_exp)) + np.zeros(air.n, dtype=np.uint64)
        t = np.asarray(ev.eval(pe.t_exp)) + np.zeros(air.n, dtype=np.uint64)
        if not np.array_equal(np.sort(f), np.sort(t)):
            failures.append(f"permutation[{i}]: multiset mismatch")
            if verbose:
                print(failures[-1], flush=True)

    # connections: values must be invariant along the sigma cycles — find
    # each cell's sigma target by matching codes x[r]*k_j and compare
    from xlayer_prover_tpu.fields import gl as glmod
    for i, ci in enumerate(air.connections if "connection" in sections
                           else ()):
        n = air.n
        x = np.empty(n, dtype=np.uint64)
        cur = 1
        wgen = glmod.host_w(air.n_bits)
        for r in range(n):
            x[r] = cur
            cur = (cur * wgen) % P
        ident = np.stack([glh.mul(x, np.uint64(k % P))
                          for k in ci.k_coeffs], axis=1).ravel()
        sig = np.stack([ev.eval(s) for s in ci.s_cols], axis=1).ravel()
        vals = np.stack([ev.eval(c) for c in ci.cols], axis=1).ravel()
        order = np.argsort(ident, kind="stable")
        pos = np.searchsorted(ident[order], sig)
        ok_code = (pos < len(order)) & (ident[order[np.minimum(
            pos, len(order) - 1)]] == sig)
        tgt = order[np.minimum(pos, len(order) - 1)]
        bad = ~ok_code | (vals != vals[tgt])
        if bad.any():
            rows = (np.nonzero(bad)[0] // len(ci.cols))[:5].tolist()
            failures.append(f"connection[{i}]: cycle value mismatch at "
                            f"rows {rows}")
            if verbose:
                print(failures[-1], flush=True)

    return failures


def _main():
    from xlayer_prover_tpu.executor.input import BatchInput
    from xlayer_prover_tpu.executor.rom import Rom
    from xlayer_prover_tpu.executor.storage_rom import StorageRom
    from xlayer_prover_tpu.prover_service import BatchProver
    from xlayer_prover_tpu.state.hashdb import HashDB

    rom = Rom.load("/root/reference/src/main_sm/fork_9/scripts/rom.json")
    srom = StorageRom.load(
        "/root/reference/config/scripts/storage_sm_rom.json")
    vec = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"
    n_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    engine = BatchProver(rom, n_bits=n_bits, max_steps=1 << 15,
                         storage_rom=srom)
    inp = BatchInput.load(vec)
    hashdb = HashDB()
    inp.load_db(hashdb)
    res = engine.executor.execute(hashdb, input_vars=inp.input_vars(),
                                  setup_registers=inp.setup_registers)
    print(f"executed {res.ctx.counters.steps} steps; checking trace "
          f"({res.cm1_np.shape[1]} committed cols x 2^{n_bits} rows)")
    failures = check_trace(engine.air, res.const_np, res.cm1_np, res.publics)
    if failures:
        print(f"FAIL: {len(failures)} violations")
        sys.exit(1)
    print("OK: trace satisfies all identity constraints + lookup membership")


if __name__ == "__main__":
    _main()
