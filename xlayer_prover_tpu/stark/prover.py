"""STARK prover: the 5-round pipeline + FRI.

Behavioral parity with Starks::genProof (src/starkpil/starks.cpp:9-404):
  round 1  LDE + Merkle of cm1                       -> root1
  round 2  draw u,defVal; plookup h1/h2 (cm2)        -> root2
  round 3  draw gamma,beta; grand products Z (cm3)   -> root3
  round 4  draw vc; quotient on ext domain, split    -> root4 (cm4)
  round 5  draw xi; evals via INTT-weighted inner products; draw v1,v2;
           DEEP/FRI polynomial; FRI fold/commit/query phases.

TPU-first mapping: sections are (rows, cols) uint32-pair arrays; every stage
is jnp (LDE = batched NTT columns, Merkle = scan levels, constraint eval =
traced expression DAG, Z = associative prefix scan, evals = stride-sampled
inner products).  Host work is only transcript scalars and proof assembly.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields import gl, gl3
from ..ops import merkle, ntt
from . import air as air_mod
from . import fri as fri_mod
from . import lookup
from .air import CH_BETA, CH_DEFVAL, CH_GAMMA, CH_U, CH_V1, CH_V2, CH_VC, CH_XI
from .commitment import get_scheme
from .eval import EvalEnv
from .proof import StarkProof
from .transcript import Transcript
from ..utils.timer import timer

P = gl.P


@dataclasses.dataclass
class Setup:
    """Preprocessed data: constant polynomials, their LDE and tree (verkey).

    On the host (eager-numpy) pipeline, `const_n`/`const_ext` are None and
    everything lives in the numpy fields — sections are streamed through
    the device in column blocks instead of held twice (the TPU-side
    replacement for the reference's single 51 GB shared buffer)."""
    air: object
    const_n: tuple
    const_ext: tuple
    const_tree: object
    const_ext_np: np.ndarray
    const_n_np: np.ndarray
    verkey: list

    @staticmethod
    def build(air, const_np: np.ndarray, host: bool = None) -> "Setup":
        assert const_np.shape == (air.n, air.const_width)
        scheme = get_scheme(air)
        if host is None:
            host = not _use_jit_pipelines()
        const_np = const_np.astype(np.uint64)
        if host and scheme.name == "gl":
            if air.const_width:
                const_ext_np = ntt.extend_pol_np(const_np, air.n_bits_ext)
            else:
                const_ext_np = np.zeros((air.n_ext, 0), dtype=np.uint64)
            tree = merkle.merkelize_np(const_ext_np, air.const_width,
                                       keep_levels_np=True)
            return Setup(air=air, const_n=None, const_ext=None,
                         const_tree=tree, const_ext_np=const_ext_np,
                         const_n_np=const_np,
                         verkey=scheme.root(tree))
        return Setup._build_device(air, const_np, scheme)

    def save(self, path: str):
        """Persist the preprocessed const artifacts (the reference's
        zkevmConstantsTree/bctree file slot, config.hpp:132-136): const
        pols, their LDE, every tree level and the verkey in one npz."""
        assert self.const_n_np is not None, \
            "artifact save is defined on the host representation"
        levels = {f"level{i}": np.asarray(lv, dtype=np.uint64)
                  for i, lv in enumerate(self.const_tree.levels)}
        np.savez_compressed(
            path, const_n=self.const_n_np, const_ext=self.const_ext_np,
            verkey=np.array(self.verkey, dtype=np.uint64),
            n_levels=np.int64(len(self.const_tree.levels)), **levels)

    @staticmethod
    def load(path: str, air) -> "Setup":
        """Load a Setup.save artifact; shape-checked against the air."""
        z = np.load(path)
        const_n_np = z["const_n"]
        assert const_n_np.shape == (air.n, air.const_width), \
            "constants artifact does not match this air geometry"
        levels = tuple(z[f"level{i}"]
                       for i in range(int(z["n_levels"])))
        tree = merkle.MerkleTree(levels=levels, width=air.const_width)
        return Setup(air=air, const_n=None, const_ext=None,
                     const_tree=tree, const_ext_np=z["const_ext"],
                     const_n_np=const_n_np,
                     verkey=[int(v) for v in z["verkey"]])

    @staticmethod
    def _build_device(air, const_np, scheme):
        const_n = gl.from_u64_np(const_np)
        if air.const_width:
            const_ext = ntt.extend_pol(const_n, air.n_bits_ext)
        else:
            const_ext = gl.zeros((air.n_ext, 0))
        tree = scheme.merkelize(const_ext, air.const_width)
        return Setup(air=air, const_n=const_n, const_ext=const_ext,
                     const_tree=tree,
                     const_ext_np=gl.to_u64_np(const_ext),
                     const_n_np=const_np,
                     verkey=scheme.root(tree))


def _const_n_dev(setup):
    if setup.const_n is not None:
        return setup.const_n
    return gl.from_u64_np(setup.const_n_np)


def _const_ext_dev(setup):
    if setup.const_ext is not None:
        return setup.const_ext
    return gl.from_u64_np(setup.const_ext_np)


def _domain_x(n_bits: int, shift: int = 1):
    return gl.powers_device(gl.host_w(n_bits), 1 << n_bits, start=shift)


def _l1_values_n(n: int):
    v = np.zeros(n, dtype=np.uint64)
    v[0] = 1
    return gl.from_u64_np(v)


def _l1_values_ext(air):
    """L1 on the ext coset: (x^N - 1) / (N (x - 1)), exact, vectorized
    (numpy power tables + device batch inverse — the old per-point python
    modexp loop cost minutes at 2^21)."""
    from ..ops.ntt import _np_modmul, _np_pow_table
    n, n_ext = air.n, air.n_ext
    w_ext = gl.host_w(air.n_bits_ext)
    inv_n = gl.host_inv(n)
    xs = _np_modmul(_np_pow_table(w_ext, n_ext), np.uint64(gl.SHIFT % P))
    wn = pow(w_ext, n, P)
    xn = _np_modmul(_np_pow_table(wn, n_ext),
                    np.uint64(pow(gl.SHIFT, n, P)))
    one = np.uint64(1)
    pm1 = np.uint64(P - 1)
    num = np.where(xn >= one, xn - one, pm1)
    den = np.where(xs >= one, xs - one, pm1)
    inv_den = gl.batch_inv(gl.from_u64_np(den))
    return gl.mul_const(gl.mul(gl.from_u64_np(num), inv_den), inv_n)


def _zi_values_ext(air):
    """1/(x^N - 1) on the ext coset; only blowup distinct values, tiled."""
    blowup = air.n_ext // air.n
    w_ext = gl.host_w(air.n_bits_ext)
    wn = pow(w_ext, air.n, P)
    xn = pow(gl.SHIFT, air.n, P)
    distinct = []
    cur = xn
    for _ in range(blowup):
        distinct.append(pow((cur - 1) % P, P - 2, P))
        cur = (cur * wn) % P
    tiled = np.tile(np.array(distinct, dtype=np.uint64), air.n)
    return gl.from_u64_np(tiled)


def _challenge_triple(t: Transcript):
    return gl3.from_ints(*t.get_field())


def _set_cols(section, start: int, triple):
    """Write a gl3 triple of (N,) arrays into columns [start:start+3]."""
    for k in range(3):
        section = section.at[:, start + k].set(triple[k])
    return section


def _expr_to_np(env, expr):
    """Evaluate an expr on the natural domain, return (N, dim) uint64."""
    kind, v = env.eval(expr)
    if kind == "base":
        return gl.to_u64_np(v)[:, None]
    return gl3.to_u64_np(v)


def _exclusive_prefix_product(ratios):
    """gl3 triple (N,) -> Z with Z[0]=1, Z[i]=prod_{j<i} ratios[j]."""
    import jax
    import jax.numpy as jnp

    pre = jax.lax.associative_scan(gl3.mul, ratios, axis=0)
    one = gl3.ones((1,))
    return tuple(jnp.concatenate([one[k], pre[k][:-1]]) for k in range(3))


# ---------------------------------------------------------------------------
# Per-air jitted stage pipelines (compiled once per circuit, cached)
# ---------------------------------------------------------------------------

_AIR_JITS = {}


def _challenges_env(ch_arr):
    """(8, 3) uint64 array -> EvalEnv challenges dict."""
    return {s: tuple(ch_arr[s, k] for k in range(3)) for s in range(8)}


def _use_jit_pipelines() -> bool:
    """Jit the round-4/5 pipelines only on accelerators: XLA CPU compile of
    the big constraint graphs is pathological (tens of minutes for lookup-
    heavy airs), while eager op-by-op dispatch reuses small cached kernels
    and finishes in seconds-to-minutes.  On TPU the one-off compile buys
    millisecond dispatch for production proving."""
    import jax
    import os
    override = os.environ.get("XLAYER_PROVER_JIT_ROUNDS")
    if override is not None:
        return override not in ("0", "false", "no")
    return jax.default_backend() != "cpu"


def get_air_jits(air):
    """Returns dict with the per-round jitted pipelines for `air`:

    round2(const_n, cm1_n, ch8x3, publics, x_n, l1_n) -> (cm2_n, bad)
    round3(const_n, cm1_n, cm2_n, ch8x3, publics, x_n, l1_n) -> cm3_n
    quotient(const_ext, cm1e, cm2e, cm3e, ch8x3, publics, x_ext, l1_ext,
             zi_ext) -> cm4_ext
    round5(sections..., cm4e, ch8x3, publics, x_ext, l1_ext) ->
             (evals (nEv,3), fri_pol triple)

    Each round is ONE traced graph: on a remote-tunnel device, eager
    expression evaluation costs a dispatch round-trip per primitive
    (~0.4 s each — measured 566 s for round 2 at 2^16), while one jitted
    call is a single dispatch.
    """
    key = id(air)
    hit = _AIR_JITS.get(key)
    if hit is not None and hit[0] is air:
        return hit[1]
    import jax
    import jax.numpy as jnp

    n, n_ext = air.n, air.n_ext
    blowup = n_ext // n
    constraints = air_mod.all_constraints(air)
    shift_inv = gl.host_inv(gl.SHIFT)
    w_n = gl.host_w(air.n_bits)

    def _pubs(publics):
        return [publics[i] for i in range(air.n_publics)]

    # Round 2 also runs as an orchestrator of small graphs: one f/t
    # evaluation graph per plookup, ONE shared sort-split graph (same
    # shapes across lookups -> one compile), one assembly graph.  The
    # single-graph version was an ~8 MB MLIR module that OOM-killed the
    # remote TPU compiler.
    _r2 = {"built": False}

    def _r2_build():
        maybe_jit = jax.jit if _use_jit_pipelines() else (lambda f: f)
        _r2["split"] = maybe_jit(lookup.calculate_h1h2_device)

        def mk_ft(pu):
            def f(const_n, cm1_n, ch, publics, x_n, l1_n):
                env = EvalEnv({"const": const_n, "cm1": cm1_n},
                              _challenges_env(ch), _pubs(publics), x_n,
                              l1_n, 1)
                return (jnp.stack(_broad3(env.eval_ext(pu.f_exp)), axis=1),
                        jnp.stack(_broad3(env.eval_ext(pu.t_exp)), axis=1))
            return maybe_jit(f)
        _r2["ft"] = [mk_ft(pu) for pu in air.plookups]
        idx = []
        for pu in air.plookups:
            idx.append((pu.h1_col.index, pu.h2_col.index))
        _r2["idx"] = idx

        def assemble(pairs):
            cm2 = gl.zeros((n, air.cm2_width))
            bad_total = jnp.uint64(0)
            for (i1, i2), (h1, h2, bad) in zip(idx, pairs):
                cm2 = _set_cols(cm2, i1, tuple(h1[:, k] for k in range(3)))
                cm2 = _set_cols(cm2, i2, tuple(h2[:, k] for k in range(3)))
                bad_total = bad_total + bad
            return cm2, bad_total
        _r2["assemble"] = maybe_jit(assemble)
        _r2["built"] = True

    def round2(const_n, cm1_n, ch, publics, x_n, l1_n):
        if not _r2["built"]:
            _r2_build()
        args = (const_n, cm1_n, ch, publics, x_n, l1_n)
        # the first dispatch of each per-lookup graph triggers its
        # compile; running them from a thread pool overlaps the compiles
        # (XLA releases the GIL; the remote TPU compile service queues
        # per-connection), which turns ~#lookups serial compile waits
        # into ~#lookups/8.  Steady-state dispatch order is unchanged —
        # results are ordered by lookup index either way.  In sync mode
        # (CPU meshes) the warm is AOT compile-only and execution is
        # strictly serial: concurrent collective executions + compiles
        # starve XLA's hardcoded 40 s CPU rendezvous (utils/sync.py).
        from concurrent.futures import ThreadPoolExecutor
        from ..utils.sync import (aot_warm, compile_workers, sync,
                                  sync_dispatch_enabled)
        if _r2["ft"] and not _r2.get("warm") and _use_jit_pipelines():
            if sync_dispatch_enabled():
                fts = [sync(fn(*args))
                       for fn in aot_warm(_r2["ft"], args)]
            else:
                # compile-only in the pool (overlaps the remote compile
                # RTTs), then dispatch in-order — executing from pool
                # threads bought nothing on-device and is the exact
                # overlap the CPU rendezvous abort punishes
                with ThreadPoolExecutor(max_workers=compile_workers()) as pool:
                    list(pool.map(lambda fn: fn.lower(*args).compile(),
                                  _r2["ft"]))
                fts = [fn(*args) for fn in _r2["ft"]]
            _r2["warm"] = True
        else:
            fts = [sync(fn(*args)) for fn in _r2["ft"]]
        pairs = [sync(_r2["split"](f_dev, t_dev)) for f_dev, t_dev in fts]
        if not pairs:
            return gl.zeros((n, air.cm2_width)), jnp.uint64(0)
        return sync(_r2["assemble"](pairs))

    # Round 3 runs as an ORCHESTRATOR of medium-sized graphs instead of
    # one monolith: tracing every z-scan + im fill into a single jit
    # produced an ~8 MB MLIR module that OOM-killed the remote TPU
    # compiler.  Shapes are shared, so the z scan compiles ONCE; each
    # num/den evaluation is its own small graph (compiled lazily, cached
    # persistently); the column assembly is one dynamic-update-slice
    # graph.  Dispatch count stays O(#z-columns), not O(#ops).
    def _mk_env(const_n, cm1_n, cm2_n, ch, publics, x_n, l1_n):
        return EvalEnv({"const": const_n, "cm1": cm1_n, "cm2": cm2_n},
                       _challenges_env(ch), _pubs(publics), x_n, l1_n, 1)

    def _zscan(num_v, den_v):
        ratios = gl3.mul(num_v, gl3.batch_inv(den_v))
        return _exclusive_prefix_product(ratios)

    def _numden_builder():
        gamma = air_mod.Challenge(CH_GAMMA)
        beta = air_mod.Challenge(CH_BETA)
        one_plus_beta = beta + 1
        gb = gamma * one_plus_beta
        jobs = []        # (z_col, num_expr, den_expr)
        conn_jobs = []   # (ci, num_factors, den_factors)
        for pu in air.plookups:
            f, t = pu.f_exp, pu.t_exp
            h1c, h2c = pu.h1_col, pu.h2_col
            num = one_plus_beta * (gamma + f) \
                * (gb + t + beta * air_mod._shift_expr(t))
            den = (gb + h1c + beta * h2c) \
                * (gb + h2c + beta * h1c.shifted())
            jobs.append((pu.z_col, num, den))
        for pe in air.permutations:
            jobs.append((pe.z_col, pe.f_exp + gamma, pe.t_exp + gamma))
        for ci in air.connections:
            xx = air_mod.XSymbol()
            num_factors = [c + beta * k * xx + gamma
                           for c, k in zip(ci.cols, ci.k_coeffs)]
            den_factors = [c + beta * s + gamma
                           for c, s in zip(ci.cols, ci.s_cols)]
            if not ci.num_ims:
                num = air_mod.Const(1)
                den = air_mod.Const(1)
                for fn_, fd in zip(num_factors, den_factors):
                    num = num * fn_
                    den = den * fd
                jobs.append((ci.z_col, num, den))
            else:
                conn_jobs.append((ci, num_factors, den_factors))
        return jobs, conn_jobs

    _r3 = {"built": False}

    def _broad3(triple):
        return tuple(jnp.broadcast_to(jnp.asarray(c), (n,))
                     for c in triple)

    def _r3_build():
        jobs, conn_jobs = _numden_builder()
        maybe_jit = jax.jit if _use_jit_pipelines() else (lambda f: f)
        _r3["zscan"] = maybe_jit(_zscan)
        _r3["z_idx"] = [zcol.index for (zcol, _n, _d) in jobs]

        def mk_numden(num_e, den_e):
            def f(const_n, cm1_n, cm2_n, ch, publics, x_n, l1_n):
                env = _mk_env(const_n, cm1_n, cm2_n, ch, publics,
                              x_n, l1_n)
                return (jnp.stack(_broad3(env.eval_ext(num_e))),
                        jnp.stack(_broad3(env.eval_ext(den_e))))
            return maybe_jit(f)
        _r3["numden"] = [mk_numden(num_e, den_e)
                         for (_z, num_e, den_e) in jobs]

        # static index maps for the ims graph outputs
        im_idx = [col.index for (col, _e) in air.im_defs]
        for (ci, _nf, _df) in conn_jobs:
            for ims in (ci.num_ims, ci.den_ims):
                im_idx.extend(im.index for im in ims)
        conn_z_idx = [ci.z_col.index for (ci, _nf, _df) in conn_jobs]
        _r3["im_idx"] = im_idx
        _r3["conn_z_idx"] = conn_z_idx

        # ONE graph per auto-committed im and per connection, NOT one
        # monolith: the fused ims graph of the zkEVM composite was a
        # 5.97 MB MLIR module that OOM-killed (SIGKILL) the remote TPU
        # compile helper (same failure class the r3 verdict recorded for
        # the round-3 monolith; measured again r5 on the 2^16 run).
        def mk_im(expr):
            def f(const_n, cm1_n, cm2_n, ch, publics, x_n, l1_n):
                env = _mk_env(const_n, cm1_n, cm2_n, ch, publics, x_n,
                              l1_n)
                k, v = env.eval(expr)
                triple = gl3.from_base(v) if k == "base" else v
                return _broad3(triple)
            return maybe_jit(f)

        def mk_conn(ci, num_factors, den_factors):
            def f(const_n, cm1_n, cm2_n, ch, publics, x_n, l1_n):
                """-> (group-product triples for this connection in
                emission order, (num_final, den_final))."""
                env = _mk_env(const_n, cm1_n, cm2_n, ch, publics, x_n,
                              l1_n)
                groups = ci.factor_groups()
                im_out = []
                finals = []
                for ims, factors in ((ci.num_ims, num_factors),
                                     (ci.den_ims, den_factors)):
                    vals = [env.eval_ext(f_) for f_ in factors]
                    prev = None
                    for gi, grp in enumerate(groups):
                        prod = prev
                        for fi in grp:
                            prod = vals[fi] if prod is None \
                                else gl3.mul(prod, vals[fi])
                        im_out.append(_broad3(prod))
                        prev = prod
                    finals.append(prev)
                return im_out, (finals[0], finals[1])
            return maybe_jit(f)

        _r3["im_fns"] = [mk_im(expr) for (_col, expr) in air.im_defs]
        _r3["conn_fns"] = [mk_conn(ci, nf, df)
                           for (ci, nf, df) in conn_jobs]

        all_idx = _r3["z_idx"] + im_idx + conn_z_idx

        def assemble(triples):
            cm3 = gl.zeros((n, air.cm3_width))
            for idx, t in zip(all_idx, triples):
                cm3 = _set_cols(cm3, idx, t)
            return cm3
        _r3["assemble"] = maybe_jit(assemble)
        _r3["built"] = True

    def round3(const_n, cm1_n, cm2_n, ch, publics, x_n, l1_n, zscan=None):
        if not _r3["built"]:
            _r3_build()
        args = (const_n, cm1_n, cm2_n, ch, publics, x_n, l1_n)
        zscan = zscan if zscan is not None else _r3["zscan"]
        # overlap the per-z-column graph compiles on first dispatch
        # (same rationale as round2; steady state is plain in-order).
        # Sync mode: AOT compile-only warm + strictly serial execution
        # (see round2 / utils/sync.py).
        from concurrent.futures import ThreadPoolExecutor
        from ..utils.sync import (aot_warm, compile_workers, sync,
                                  sync_dispatch_enabled)
        all_fns = _r3["numden"] + _r3["im_fns"] + _r3["conn_fns"]
        if all_fns and not _r3.get("warm") and _use_jit_pipelines():
            if sync_dispatch_enabled():
                warmed = aot_warm(all_fns, args)
            else:
                with ThreadPoolExecutor(max_workers=compile_workers()) as pool:
                    list(pool.map(lambda fn: fn.lower(*args).compile(),
                                  all_fns))
                warmed = all_fns
            _r3["warm"] = True
        else:
            warmed = all_fns
        n_nd = len(_r3["numden"])
        n_im = len(_r3["im_fns"])
        nds = [sync(fn(*args)) for fn in warmed[:n_nd]]
        triples = []
        for num_s, den_s in nds:
            triples.append(sync(zscan(tuple(num_s[k] for k in range(3)),
                                      tuple(den_s[k] for k in range(3)))))
        im_triples = []
        conn_triples = []
        for fn in warmed[n_nd:n_nd + n_im]:
            im_triples.append(tuple(sync(fn(*args))))
        for fn in warmed[n_nd + n_im:]:
            im_out, (num_v, den_v) = sync(fn(*args))
            im_triples.extend(tuple(t) for t in im_out)
            conn_triples.append(sync(zscan(tuple(num_v), tuple(den_v))))
        triples.extend(im_triples)
        triples.extend(conn_triples)
        return sync(_r3["assemble"](triples))

    # The quotient runs as an ORCHESTRATOR of constraint-chunk graphs:
    # tracing all_constraints of the zkEVM composite into one jit
    # produces a multi-MB MLIR module of the same class that OOM-killed
    # (SIGKILL) the remote TPU compile helper on the round-3 ims graph.
    # Horner over vc is chunk-associative in exact field arithmetic —
    # acc' = acc * vc^len(chunk) + Horner(chunk) — so the chunked value
    # (and the proof bytes) are identical to the monolith's.
    _q = {"built": False}
    _QCHUNK = 24

    def _q_build():
        maybe_jit = jax.jit if _use_jit_pipelines() else (lambda f: f)
        chunk_lists = [constraints[i:i + _QCHUNK]
                       for i in range(0, len(constraints), _QCHUNK)]

        def mk_qchunk(chunk):
            def f(const_ext, cm1e, cm2e, cm3e, ch, publics, x_ext,
                  l1_ext):
                sections = {"const": const_ext, "cm1": cm1e,
                            "cm2": cm2e, "cm3": cm3e}
                pubs = [publics[i] for i in range(air.n_publics)]
                env = EvalEnv(sections, _challenges_env(ch), pubs,
                              x_ext, l1_ext, blowup)
                vc = tuple(ch[CH_VC, k] for k in range(3))
                acc = None
                for c in chunk:
                    val = env.eval_ext(c)
                    acc = val if acc is None \
                        else gl3.add(gl3.mul(acc, vc), val)
                return tuple(jnp.broadcast_to(jnp.asarray(v), (n_ext,))
                             for v in acc)
            return maybe_jit(f)
        _q["chunks"] = [(mk_qchunk(cl), len(cl)) for cl in chunk_lists]

        def mk_combine(k_len):
            def f(acc, chunk_val, ch):
                vc = tuple(ch[CH_VC, kk] for kk in range(3))
                e, base, vpow = k_len, vc, None
                while e:
                    if e & 1:
                        vpow = base if vpow is None \
                            else gl3.mul(vpow, base)
                    base = gl3.mul(base, base)
                    e >>= 1
                return gl3.add(gl3.mul(acc, vpow), chunk_val)
            return maybe_jit(f)
        _q["mk_combine"] = mk_combine
        _q["combine"] = {}

        def qfinal(acc, ch, zi_ext):
            q_vals = tuple(gl.mul(c, zi_ext) for c in acc)
            q_coeffs = ntt.intt(gl3.stack_cols(q_vals), air.n_bits_ext)
            shift_in = pow(shift_inv, n, P)
            parts = []
            cur_s = 1
            for p_i in range(air.q_deg):
                chunk = gl.mul_const(q_coeffs[p_i * n:(p_i + 1) * n],
                                     cur_s)
                cur_s = (cur_s * shift_in) % P
                chunk = jnp.pad(chunk, ((0, n_ext - n), (0, 0)))
                parts.append(ntt.ntt(chunk, air.n_bits_ext))
            return jnp.concatenate(parts, axis=1)
        _q["final"] = maybe_jit(qfinal)
        _q["built"] = True

    def quotient(const_ext, cm1e, cm2e, cm3e, ch, publics, x_ext, l1_ext,
                 zi_ext):
        if not _q["built"]:
            _q_build()
        from concurrent.futures import ThreadPoolExecutor
        from ..utils.sync import (aot_warm, compile_workers, sync,
                                  sync_dispatch_enabled)
        args8 = (const_ext, cm1e, cm2e, cm3e, ch, publics, x_ext, l1_ext)
        fns = [fn for fn, _l in _q["chunks"]]
        if fns and not _q.get("warm") and _use_jit_pipelines():
            if sync_dispatch_enabled():
                aot_warm(fns, args8)
            else:
                with ThreadPoolExecutor(max_workers=compile_workers()) as pool:
                    list(pool.map(
                        lambda fn: fn.lower(*args8).compile(), fns))
            _q["warm"] = True
        acc = None
        for fn, klen in _q["chunks"]:
            cv = sync(fn(*args8))
            if acc is None:
                acc = cv
            else:
                comb = _q["combine"].get(klen)
                if comb is None:
                    comb = _q["combine"][klen] = _q["mk_combine"](klen)
                acc = sync(comb(acc, cv, ch))
        return sync(_q["final"](acc, ch, zi_ext))

    # distinct evaluation shifts appearing in the ev map (0 = xi itself)
    shifts = sorted({e.shift for e in air.ev_map})

    # Round 5 is ALSO an orchestrator of ev-map-chunk graphs: the zkEVM
    # composite's ev map has thousands of entries, putting the monolith
    # in the same multi-MB-MLIR class that OOM-kills the remote TPU
    # compile helper (see quotient/ims).  Chunking is value-exact: evals
    # are per-entry independent; the DEEP accumulators chunk with
    # v1^offset factors (static-exponent square-and-multiply) and the
    # per-shift partial sums re-associate exactly in the field.
    _r5 = {"built": False}
    _EVCHUNK = 128

    def _r5_build():
        maybe_jit = jax.jit if _use_jit_pipelines() else (lambda f: f)
        ev_entries = list(air.ev_map)
        chunk_list = [(i, ev_entries[i:i + _EVCHUNK])
                      for i in range(0, len(ev_entries), _EVCHUNK)]

        def weights_fn(ch):
            xi = tuple(ch[CH_XI, k] for k in range(3))
            return tuple(_lagrange_weights_traced(
                gl3.mul_base(xi, jnp.uint64((pow(w_n, s_, P) * shift_inv)
                                            % P)), air.n_bits)
                for s_ in shifts)
        _r5["weights"] = maybe_jit(weights_fn)

        def mk_evchunk(chunk):
            def f(const_ext, cm1e, cm2e, cm3e, cm4e, ch, weights):
                sections = {"const": const_ext, "cm1": cm1e, "cm2": cm2e,
                            "cm3": cm3e, "cm4": cm4e}
                evals = []
                for entry in chunk:
                    sec = sections[entry.section]
                    samp = sec[::blowup]
                    w3 = weights[shifts.index(entry.shift)]
                    if entry.dim == 1:
                        col = samp[:, entry.index]
                        prod = tuple(gl.mul(w, col) for w in w3)
                    else:
                        col3 = tuple(samp[:, entry.index + k]
                                     for k in range(3))
                        prod = gl3.mul(w3, col3)
                    evals.append(jnp.stack(list(
                        gl3.sum_axis(prod, axis=0))))
                return jnp.stack(evals)        # (len(chunk), 3)
            return maybe_jit(f)
        _r5["ev_chunks"] = [mk_evchunk(c) for (_o, c) in chunk_list]

        def mk_fpchunk(offset, chunk):
            def f(const_ext, cm1e, cm2e, cm3e, cm4e, ch, evals_arr):
                sections = {"const": const_ext, "cm1": cm1e, "cm2": cm2e,
                            "cm3": cm3e, "cm4": cm4e}
                v1 = tuple(ch[CH_V1, k] for k in range(3))
                e, base = offset, v1
                v1_pow = gl3.ones(())
                while e:
                    if e & 1:
                        v1_pow = gl3.mul(v1_pow, base)
                    base = gl3.mul(base, base)
                    e >>= 1
                accs = {s_: gl3.zeros((n_ext,)) for s_ in shifts}
                for j, entry in enumerate(chunk):
                    sec = sections[entry.section]
                    if entry.dim == 1:
                        colv = gl3.from_base(sec[:, entry.index])
                    else:
                        colv = tuple(sec[:, entry.index + k]
                                     for k in range(3))
                    ev3 = tuple(evals_arr[offset + j, k]
                                for k in range(3))
                    term = gl3.mul(gl3.sub(colv, ev3), v1_pow)
                    accs[entry.shift] = gl3.add(accs[entry.shift], term)
                    v1_pow = gl3.mul(v1_pow, v1)
                return tuple(accs[s_] for s_ in shifts)
            return maybe_jit(f)
        _r5["fp_chunks"] = [mk_fpchunk(o, c) for (o, c) in chunk_list]

        def acc_add(a, b):
            return tuple(gl3.add(x, y) for x, y in zip(a, b))
        _r5["acc_add"] = maybe_jit(acc_add)

        def fp_final(accs, ch, x_ext):
            xi = tuple(ch[CH_XI, k] for k in range(3))
            v2 = tuple(ch[CH_V2, k] for k in range(3))
            fri_pol = gl3.zeros((n_ext,))
            v2_pow = gl3.ones(())
            for si_, s_ in enumerate(shifts):
                pt = gl3.mul_base(xi, jnp.uint64(pow(w_n, s_, P)))
                xdiv = _x_div_x_sub_traced(x_ext, pt)
                fri_pol = gl3.add(
                    fri_pol, gl3.mul(gl3.mul(accs[si_], xdiv), v2_pow))
                v2_pow = gl3.mul(v2_pow, v2)
            return fri_pol
        _r5["fp_final"] = maybe_jit(fp_final)
        _r5["built"] = True

    def round5(const_ext, cm1e, cm2e, cm3e, cm4e, ch, publics, x_ext,
               l1_ext, phase="both", evals_arr=None):
        if not _r5["built"]:
            _r5_build()
        from concurrent.futures import ThreadPoolExecutor
        from ..utils.sync import (aot_warm, compile_workers, sync,
                                  sync_dispatch_enabled)
        secs5 = (const_ext, cm1e, cm2e, cm3e, cm4e)
        if evals_arr is None:
            weights = sync(_r5["weights"](ch))
            ev_args = secs5 + (ch, weights)
            if not _r5.get("warm_ev") and _use_jit_pipelines():
                if sync_dispatch_enabled():
                    aot_warm(_r5["ev_chunks"], ev_args)
                else:
                    with ThreadPoolExecutor(max_workers=compile_workers()) as pool:
                        list(pool.map(lambda fn:
                                      fn.lower(*ev_args).compile(),
                                      _r5["ev_chunks"]))
                _r5["warm_ev"] = True
            parts = [sync(fn(*ev_args)) for fn in _r5["ev_chunks"]]
            evals_arr = parts[0] if len(parts) == 1 \
                else jnp.concatenate(parts, axis=0)
        if phase == "evals":
            return evals_arr, None
        fp_args = secs5 + (ch, evals_arr)
        if not _r5.get("warm_fp") and _use_jit_pipelines():
            if sync_dispatch_enabled():
                aot_warm(_r5["fp_chunks"], fp_args)
            else:
                with ThreadPoolExecutor(max_workers=compile_workers()) as pool:
                    list(pool.map(lambda fn:
                                  fn.lower(*fp_args).compile(),
                                  _r5["fp_chunks"]))
            _r5["warm_fp"] = True
        accs = None
        for fn in _r5["fp_chunks"]:
            part = sync(fn(*fp_args))
            accs = part if accs is None \
                else sync(_r5["acc_add"](accs, part))
        fri_pol = sync(_r5["fp_final"](accs, ch, x_ext))
        return evals_arr, fri_pol

    # round2/round3/quotient/round5 are orchestrators managing their own
    # (small) jits — wrapping them in jax.jit would inline everything
    # back into the monolithic graphs that OOM-kill the remote compiler
    jits = {"round2": round2, "round3": round3,
            "quotient": quotient, "round5": round5}
    _AIR_JITS[key] = (air, jits)
    return jits


def _lagrange_weights_traced(point3, n_bits: int):
    series = gl3.powers_device(point3, 1 << n_bits)
    return gl3.from_cols(ntt.intt(gl3.stack_cols(series), n_bits))


def _x_div_x_sub_traced(x_ext, point3):
    diff = gl3.sub(gl3.from_base(x_ext), point3)
    return gl3.mul_base(gl3.batch_inv(diff), x_ext)


class ProofCancelled(Exception):
    """Raised between rounds when an abort_check callback fires (the
    cooperative mid-proof cancellation the reference lacks — its
    cancel only skips queued jobs, prover.cpp:300-349)."""


def gen_proof(setup: Setup, cm1_np: np.ndarray, publics,
              mesh=None, abort_check=None) -> StarkProof:
    """Generate a STARK proof; with `mesh` (jax.sharding.Mesh) the row axis
    of every section is sharded across the devices (SURVEY §2.7 P7/P8: the
    reference's shared 51 GB buffer + OpenMP loops become GSPMD arrays with
    ICI collectives).  Sharding only changes the partitioning, never the
    values: sharded and unsharded proofs are byte-identical (tested).

    abort_check: optional zero-arg callable polled at each round
    boundary; returning True raises ProofCancelled."""
    air = setup.air
    def _abort_point():
        if abort_check is not None and abort_check():
            raise ProofCancelled("proof aborted between rounds")
    n, n_ext = air.n, air.n_ext
    blowup = n_ext // n
    publics = [int(p) % P for p in publics]
    assert len(publics) == air.n_publics
    assert cm1_np.shape == (n, air.cm1_width)
    host = (not _use_jit_pipelines()) and mesh is None
    scheme = get_scheme(air)
    if mesh is not None:
        if not _use_jit_pipelines():
            # CPU meshes: host expression evaluation + sharded structural
            # stages.  XLA:CPU executes the traced constraint mega-fusions
            # pathologically slowly (a single zkEVM per-lookup graph of
            # ~29k fused HLO ops burned 30+ CPU-minutes at 2^14 — measured
            # r5), so the full-jit mesh path is accelerator-only.
            return _gen_proof_mesh_hybrid(setup, cm1_np, publics, mesh,
                                          scheme)
        return _gen_proof_mesh(setup, cm1_np, publics, mesh, scheme)

    transcript = scheme.transcript()
    transcript.put(setup.verkey)
    transcript.put(publics)

    x_n = _domain_x(air.n_bits)
    x_ext = _domain_x(air.n_bits_ext, shift=gl.SHIFT)
    l1_n = _l1_values_n(n)
    l1_ext = _l1_values_ext(air)
    zi_ext = _zi_values_ext(air)

    publics_dev = [gl.full((), p) for p in publics]
    challenges = {}

    # ---- round 1: cm1 (reference STARK_STEP_1, starks.cpp:53-60) ------
    t_r1 = timer("stark.step1_lde_merkle", log=True)
    t_r1.__enter__()
    if host:
        # host pipeline: every ext section is ONE numpy array; the LDE and
        # Merkle leaf hashing stream column blocks through the device, with
        # the block width chosen by the StarkInfo memory planner (the
        # section plan replacing the reference's 51 GB buffer,
        # commit_pols.hpp:1735-1737 / starks.cpp:102-105)
        from .stark_info import info_from_air, memory_plan
        plan = memory_plan(info_from_air(air), n_devices=1)
        blk = int(plan.get("stream_block_cols", 64))
        cm1_np = cm1_np.astype(np.uint64)
        cm1_n = None
        cm1_ext = ntt.extend_pol_np(cm1_np, air.n_bits_ext,
                                    block_cols=max(8, min(blk, 64)))
    else:
        cm1_n = gl.from_u64_np(cm1_np.astype(np.uint64))
        cm1_ext = ntt.extend_pol(cm1_n, air.n_bits_ext)
    tree1 = scheme.merkelize(cm1_ext, air.cm1_width)
    root1 = scheme.root(tree1)
    transcript.put(root1)
    t_r1.__exit__(None, None, None)

    sections_n = {"const": None if host else _const_n_dev(setup),
                  "cm1": cm1_n}
    sections_ext = {"const": setup.const_ext_np if host
                    else _const_ext_dev(setup),
                    "cm1": cm1_ext}

    # ---- round 2: plookup h1/h2 --------------------------------------
    challenges[CH_U] = _challenge_triple(transcript)
    challenges[CH_DEFVAL] = _challenge_triple(transcript)

    def env_n():
        if host:
            secs = {"const": setup.const_n_np, "cm1": cm1_np}
            if "cm2" in sections_n:
                secs["cm2"] = sections_n["cm2"]
            return EvalEnv(secs, _host_challenges(challenges),
                           [np.uint64(p) for p in publics],
                           gl.to_u64_np(x_n), gl.to_u64_np(l1_n), 1,
                           host=True)
        return EvalEnv(sections_n, challenges, publics_dev, x_n, l1_n, 1)

    _abort_point()
    t_r2 = timer("stark.step2_h1h2", log=True)
    t_r2.__enter__()
    if host:
        e = env_n()
        cm2_np = np.zeros((n, air.cm2_width), dtype=np.uint64)
        for pu in air.plookups:
            f_np = _expr_to_np(e, pu.f_exp)
            t_np = _expr_to_np(e, pu.t_exp)
            h1, h2 = lookup.calculate_h1h2(f_np, t_np)
            d = f_np.shape[1]
            cm2_np[:, pu.h1_col.index:pu.h1_col.index + d] = h1
            cm2_np[:, pu.h2_col.index:pu.h2_col.index + d] = h2
        cm2_n = cm2_np
    else:
        # device multiset split, whole round as ONE jitted graph
        jits = get_air_jits(air)
        publics_arr = gl.from_u64_np(np.array(publics + [0],
                                              dtype=np.uint64))
        cm2_n, bad_total = jits["round2"](sections_n["const"], cm1_n,
                                          _challenges_array(challenges),
                                          publics_arr, x_n, l1_n)
        if air.plookups:
            assert int(bad_total) == 0, \
                "plookup: f contains values missing from t"
    if host:
        cm2_ext = ntt.extend_pol_np(cm2_np, air.n_bits_ext) \
            if air.cm2_width else np.zeros((n_ext, 0), dtype=np.uint64)
    elif air.cm2_width:
        cm2_ext = ntt.extend_pol(cm2_n, air.n_bits_ext)
    else:
        cm2_ext = gl.zeros((n_ext, 0))
    tree2 = scheme.merkelize(cm2_ext, air.cm2_width)
    root2 = scheme.root(tree2)
    transcript.put(root2)
    sections_n["cm2"] = cm2_n
    sections_ext["cm2"] = cm2_ext
    t_r2.__exit__(None, None, None)

    # ---- round 3: grand products Z -----------------------------------
    challenges[CH_GAMMA] = _challenge_triple(transcript)
    challenges[CH_BETA] = _challenge_triple(transcript)
    _abort_point()
    t_r3 = timer("stark.step3_z", log=True)
    t_r3.__enter__()
    if host:
        e = env_n()
        gamma = air_mod.Challenge(CH_GAMMA)
        beta = air_mod.Challenge(CH_BETA)
        one_plus_beta = beta + 1
        gb = gamma * one_plus_beta

        z_triples = []
        for pu in air.plookups:
            f, t = pu.f_exp, pu.t_exp
            h1 = pu.h1_col
            h2 = pu.h2_col
            num = one_plus_beta * (gamma + f) \
                * (gb + t + beta * air_mod._shift_expr(t))
            den = (gb + h1 + beta * h2) * (gb + h2 + beta * h1.shifted())
            z_triples.append((pu.z_col, e.eval_ext(num), e.eval_ext(den)))
        for pe in air.permutations:
            num = pe.f_exp + gamma
            den = pe.t_exp + gamma
            z_triples.append((pe.z_col, e.eval_ext(num), e.eval_ext(den)))
        im_fills = []       # (col, triple) intermediate products to commit
        for ci in air.connections:
            xx = air_mod.XSymbol()
            num_factors = [c + beta * k * xx + gamma
                           for c, k in zip(ci.cols, ci.k_coeffs)]
            den_factors = [c + beta * s + gamma
                           for c, s in zip(ci.cols, ci.s_cols)]
            if not ci.num_ims:
                num = air_mod.Const(1)
                den = air_mod.Const(1)
                for fn, fd in zip(num_factors, den_factors):
                    num = num * fn
                    den = den * fd
                z_triples.append((ci.z_col, e.eval_ext(num),
                                  e.eval_ext(den)))
            else:
                from ..fields import glh
                groups = ci.factor_groups()
                finals = []
                for ims, factors in ((ci.num_ims, num_factors),
                                     (ci.den_ims, den_factors)):
                    vals = [e.eval_ext(f) for f in factors]
                    vals = [tuple(np.asarray(c, dtype=np.uint64) for c in v)
                            for v in vals]
                    prev = None
                    for gi, grp in enumerate(groups):
                        prod = prev
                        for fi in grp:
                            prod = vals[fi] if prod is None \
                                else glh.mul3(prod, vals[fi])
                        im_fills.append((ims[gi], prod))
                        prev = prod
                    finals.append(prev)
                z_triples.append((ci.z_col, finals[0], finals[1]))

        # auto-committed degree-lowering ims (air.im_defs): evaluate on H
        for (col, expr) in air.im_defs:
            k, v = e.eval(expr)
            if k == "base":
                v = np.asarray(v, dtype=np.uint64) \
                    + np.zeros(n, dtype=np.uint64)
                triple = (v, np.zeros(n, dtype=np.uint64),
                          np.zeros(n, dtype=np.uint64))
            else:
                triple = v
            im_fills.append((col, triple))

        cm3_np = np.zeros((n, air.cm3_width), dtype=np.uint64)
        for (col, triple) in im_fills:
            for k in range(3):
                cm3_np[:, col.index + k] = np.asarray(triple[k],
                                                      dtype=np.uint64)
        for (zcol, num_v, den_v) in z_triples:
            from ..fields import glh
            num_v = tuple(np.asarray(v, dtype=np.uint64) for v in num_v)
            den_v = tuple(np.asarray(v, dtype=np.uint64) for v in den_v)
            ratios = tuple(gl.from_u64_np(c) for c in
                           glh.mul3(num_v, glh.inv3(den_v)))
            z = _exclusive_prefix_product(ratios)
            for k in range(3):
                cm3_np[:, zcol.index + k] = np.asarray(z[k], dtype=np.uint64)
        cm3_n = cm3_np
        cm3_ext = ntt.extend_pol_np(cm3_np, air.n_bits_ext) \
            if air.cm3_width else np.zeros((n_ext, 0), dtype=np.uint64)
    else:
        # whole round traced as one graph (ims + every Z scan)
        cm3_n = jits["round3"](sections_n["const"], cm1_n,
                               sections_n["cm2"],
                               _challenges_array(challenges),
                               publics_arr, x_n, l1_n)
        if air.cm3_width:
            cm3_ext = ntt.extend_pol(cm3_n, air.n_bits_ext)
        else:
            cm3_ext = gl.zeros((n_ext, 0))
    tree3 = scheme.merkelize(cm3_ext, air.cm3_width)
    root3 = scheme.root(tree3)
    transcript.put(root3)
    sections_n["cm3"] = cm3_n
    if host:
        # rounds 4-5 and FRI only read the extended domain: drop the
        # natural-domain sections to bound peak RSS at scale
        sections_n = {}
        cm2_n = cm2_np = cm3_n = cm3_np = None
    sections_ext["cm3"] = cm3_ext
    t_r3.__exit__(None, None, None)

    # ---- round 4: quotient (reference STARK_STEP_4) -------------------
    challenges[CH_VC] = _challenge_triple(transcript)
    t_r4 = timer("stark.step4_quotient", log=True)
    t_r4.__enter__()
    publics_arr = gl.from_u64_np(np.array(publics + [0], dtype=np.uint64))
    if host:
        sections_ext_np = sections_ext      # already numpy on the host path
        cm4_ext = gl.to_u64_np(_host_quotient(
            air, setup, sections_ext_np, challenges, publics, x_ext, l1_ext,
            zi_ext))
        sections_ext_np["cm4"] = cm4_ext
    else:
        jits = get_air_jits(air)
        cm4_ext = jits["quotient"](sections_ext["const"], cm1_ext, cm2_ext,
                                   cm3_ext, _challenges_array(challenges),
                                   publics_arr, x_ext, l1_ext, zi_ext)
    tree4 = scheme.merkelize(cm4_ext, air.cm4_width)
    root4 = scheme.root(tree4)
    transcript.put(root4)
    sections_ext["cm4"] = cm4_ext
    t_r4.__exit__(None, None, None)

    # ---- round 5: evals + DEEP/FRI polynomial ------------------------
    challenges[CH_XI] = _challenge_triple(transcript)
    t_r5 = timer("stark.step5_evals_deep", log=True)
    t_r5.__enter__()
    if host:
        evals = _host_evals(air, sections_ext_np, challenges, blowup)
        for ev in evals:
            transcript.put(ev)
        challenges[CH_V1] = _challenge_triple(transcript)
        challenges[CH_V2] = _challenge_triple(transcript)
        fri_pol = _host_fri_pol(air, sections_ext_np, challenges, evals,
                                gl.to_u64_np(x_ext))
    else:
        jits = get_air_jits(air)
        evals_arr, _ = _round5_with(jits, setup, sections_ext, challenges,
                                    publics_arr, x_ext, l1_ext,
                                    phase="evals")
        evals = [[int(v) for v in row] for row in np.asarray(evals_arr)]
        for ev in evals:
            transcript.put(ev)
        challenges[CH_V1] = _challenge_triple(transcript)
        challenges[CH_V2] = _challenge_triple(transcript)
        _, fri_pol = _round5_with(jits, setup, sections_ext, challenges,
                                  publics_arr, x_ext, l1_ext,
                                  phase="fri", evals_arr=evals_arr)

    t_r5.__exit__(None, None, None)

    # ---- FRI (reference STARK_STEP_FRI) -------------------------------
    t_fri = timer("stark.step_fri", log=True)
    t_fri.__enter__()
    trees_main = [tree1, tree2, tree3, tree4, setup.const_tree]
    if host:
        sources_main = [sections_ext_np["cm1"], sections_ext_np["cm2"],
                        sections_ext_np["cm3"], sections_ext_np["cm4"],
                        setup.const_ext_np]
        fri_pol = tuple(gl.from_u64_np(c) for c in fri_pol)
    else:
        # keep device arrays: the FRI query phase gathers only the query
        # rows on-device (one small pull per tree) — pulling the full
        # extended sections costs GBs over a remote-device tunnel
        sources_main = [cm1_ext, cm2_ext, cm3_ext, cm4_ext,
                        setup.const_ext_np]
    fri_steps_data, final_pol, _ys = fri_mod.prove(
        transcript, fri_pol, air, trees_main, sources_main, scheme)
    t_fri.__exit__(None, None, None)

    return StarkProof(roots=[root1, root2, root3, root4],
                      evals=evals,
                      fri_steps=fri_steps_data,
                      final_pol=final_pol,
                      publics=publics)


def _gen_proof_mesh(setup, cm1_np, publics, mesh, scheme) -> StarkProof:
    """See gen_proof.  NOTE for CPU meshes: prefer
    XLAYER_PROVER_JIT_ROUNDS=1 — eager SPMD ops enter their collectives
    independently per device thread, and XLA's CPU rendezvous hard-aborts
    the process when one thread is descheduled >40 s; inside a jitted
    executable all partitions reach the collective in lockstep."""
    """The sharded prover: every device stage runs under the mesh with the
    row axis partitioned — natural-domain sections included, so round-2/3
    expression evaluation runs SPMD (jnp.roll shifts become ICI permutes).
    The plookup split is the device lax.sort path under the mesh; the
    grand-product scan is the shard_map distributed scan
    (parallel/pipeline.py); FRI folds and query gathers stay on-device
    (no section-sized host pulls — SURVEY §2.7 P8, friProve.cpp:153-178)."""
    import jax
    import jax.numpy as jnp
    from ..parallel import pipeline as par
    from ..utils.sync import sync

    air = setup.air
    n, n_ext = air.n, air.n_ext
    blowup = n_ext // n

    transcript = scheme.transcript()
    transcript.put(setup.verkey)
    transcript.put(publics)

    row = par.row_sharding(mesh)
    row1 = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
        par.AXIS))

    def shard(sec):
        return jax.device_put(sec, row)

    def shard1(vec):
        return jax.device_put(vec, row1)

    x_n = shard1(_domain_x(air.n_bits))
    x_ext = shard1(_domain_x(air.n_bits_ext, shift=gl.SHIFT))
    l1_n = shard1(_l1_values_n(n))
    l1_ext = shard1(_l1_values_ext(air))
    zi_ext = shard1(_zi_values_ext(air))
    challenges = {}

    with mesh:
        t_stage = timer("stark.mesh_r1", log=True)
        t_stage.__enter__()
        # ---- round 1 --------------------------------------------------
        cm1_n = shard(gl.from_u64_np(cm1_np.astype(np.uint64)))
        cm1_ext = sync(par.lde_sharded(cm1_n, air.n_bits_ext, mesh))
        tree1 = scheme.merkelize(cm1_ext, air.cm1_width)
        root1 = scheme.root(tree1)
        transcript.put(root1)
        sections_n = {"const": shard(_const_n_dev(setup)), "cm1": cm1_n}
        sections_ext = {"const": shard(_const_ext_dev(setup)),
                        "cm1": cm1_ext}

        t_stage.__exit__(None, None, None)
        t_stage = timer("stark.mesh_r2", log=True)
        t_stage.__enter__()
        # ---- round 2: the per-lookup orchestrator under the mesh --------
        challenges[CH_U] = _challenge_triple(transcript)
        challenges[CH_DEFVAL] = _challenge_triple(transcript)
        jits = get_air_jits(air)
        publics_arr = gl.from_u64_np(np.array(publics + [0],
                                              dtype=np.uint64))
        cm2_n, bad_total = jits["round2"](
            sections_n["const"], cm1_n, _challenges_array(challenges),
            publics_arr, x_n, l1_n)
        if air.plookups:
            assert int(bad_total) == 0, \
                "plookup: f contains values missing from t"
        cm2_n = shard(cm2_n)
        cm2_ext = sync(par.lde_sharded(cm2_n, air.n_bits_ext, mesh)) \
            if air.cm2_width else gl.zeros((n_ext, 0))
        tree2 = scheme.merkelize(cm2_ext, air.cm2_width)
        root2 = scheme.root(tree2)
        transcript.put(root2)
        sections_n["cm2"] = cm2_n
        sections_ext["cm2"] = cm2_ext

        t_stage.__exit__(None, None, None)
        t_stage = timer("stark.mesh_r3", log=True)
        t_stage.__enter__()
        # ---- round 3: the orchestrator with the shard_map scan ----------
        challenges[CH_GAMMA] = _challenge_triple(transcript)
        challenges[CH_BETA] = _challenge_triple(transcript)
        gp = jax.jit(par.build_grand_product_sharded(mesh))

        def mesh_zscan(num_v, den_v):
            num_v = tuple(jax.device_put(jnp.asarray(c, jnp.uint64), row1)
                          for c in num_v)
            den_v = tuple(jax.device_put(jnp.asarray(c, jnp.uint64), row1)
                          for c in den_v)
            return gp(num_v, den_v)

        cm3_n = shard(jits["round3"](
            sections_n["const"], cm1_n, cm2_n,
            _challenges_array(challenges), publics_arr, x_n, l1_n,
            zscan=mesh_zscan))
        cm3_ext = sync(par.lde_sharded(cm3_n, air.n_bits_ext, mesh)) \
            if air.cm3_width else gl.zeros((n_ext, 0))
        tree3 = scheme.merkelize(cm3_ext, air.cm3_width)
        root3 = scheme.root(tree3)
        transcript.put(root3)
        sections_ext["cm3"] = cm3_ext

        t_stage.__exit__(None, None, None)
        t_stage = timer("stark.mesh_r45", log=True)
        t_stage.__enter__()
        # ---- rounds 4+5: jitted pipelines under the mesh ---------------
        challenges[CH_VC] = _challenge_triple(transcript)
        jits = get_air_jits(air)
        publics_arr = gl.from_u64_np(np.array(publics + [0],
                                              dtype=np.uint64))
        cm4_ext = sync(jits["quotient"](sections_ext["const"], cm1_ext,
                                        sections_ext["cm2"], cm3_ext,
                                        _challenges_array(challenges),
                                        publics_arr, x_ext, l1_ext,
                                        zi_ext))
        tree4 = scheme.merkelize(cm4_ext, air.cm4_width)
        root4 = scheme.root(tree4)
        transcript.put(root4)
        sections_ext["cm4"] = cm4_ext

        challenges[CH_XI] = _challenge_triple(transcript)
        evals_arr, _ = _round5_with(jits, setup, sections_ext, challenges,
                                    publics_arr, x_ext, l1_ext,
                                    phase="evals")
        evals = [[int(v) for v in row] for row in np.asarray(evals_arr)]
        for ev in evals:
            transcript.put(ev)
        challenges[CH_V1] = _challenge_triple(transcript)
        challenges[CH_V2] = _challenge_triple(transcript)
        _, fri_pol = _round5_with(jits, setup, sections_ext, challenges,
                                  publics_arr, x_ext, l1_ext,
                                  phase="fri", evals_arr=evals_arr)
        sync(fri_pol)

        t_stage.__exit__(None, None, None)
        t_stage = timer("stark.mesh_fri", log=True)
        t_stage.__enter__()
        # ---- FRI: folds and query gathers stay on-device ---------------
        trees_main = [tree1, tree2, tree3, tree4, setup.const_tree]
        sources_main = [cm1_ext, sections_ext["cm2"], cm3_ext, cm4_ext,
                        sections_ext["const"]]
        fri_steps_data, final_pol, _ys = fri_mod.prove(
            transcript, fri_pol, air, trees_main, sources_main, scheme)
        t_stage.__exit__(None, None, None)

    return StarkProof(roots=[root1, root2, root3, root4],
                      evals=evals,
                      fri_steps=fri_steps_data,
                      final_pol=final_pol,
                      publics=publics)


def _gen_proof_mesh_hybrid(setup, cm1_np, publics, mesh, scheme) -> StarkProof:
    """The CPU-mesh pipeline: host (numpy/glh) expression evaluation +
    every structural stage sharded under the mesh.

    Rationale (measured, round 5): XLA:CPU fuses a traced zkEVM
    per-lookup expression graph into ~29k-instruction mega-fusions whose
    execution burned 30+ CPU-minutes for ONE lookup at 2^14 — the
    full-jit mesh path (_gen_proof_mesh) is therefore accelerator-only.
    Everything that carries the multi-chip design still runs sharded
    here: the LDE's all-to-all reshards (par.lde_sharded), the Merkle
    builds over row-sharded leaves, the distributed lax.sort h1/h2
    split, the shard_map grand-product scan (par.
    build_grand_product_sharded), and the FRI folds + on-device query
    gathers (SURVEY §2.7 P8; friProve.cpp:153-178).  Expression values
    are identical on every path, so the proof byte-equals the
    single-device host proof (asserted by tools/mesh_zkevm_dryrun.py).
    """
    import jax
    import jax.numpy as jnp
    from ..fields import glh
    from ..parallel import pipeline as par
    from ..utils.sync import sync

    air = setup.air
    n, n_ext = air.n, air.n_ext
    blowup = n_ext // n
    publics = [int(p) % P for p in publics]

    transcript = scheme.transcript()
    transcript.put(setup.verkey)
    transcript.put(publics)

    row = par.row_sharding(mesh)

    def shard(arr):
        return jax.device_put(arr, row)

    x_n_np = gl.to_u64_np(_domain_x(air.n_bits))
    x_ext_np = gl.to_u64_np(_domain_x(air.n_bits_ext, shift=gl.SHIFT))
    l1_n_np = gl.to_u64_np(_l1_values_n(n))
    l1_ext_np = gl.to_u64_np(_l1_values_ext(air))
    zi_ext_np = gl.to_u64_np(_zi_values_ext(air))
    challenges = {}

    split_jit = jax.jit(lookup.calculate_h1h2_device)
    gp = jax.jit(par.build_grand_product_sharded(mesh))

    with mesh:
        # ---- round 1: sharded LDE + sharded Merkle --------------------
        t_stage = timer("stark.mesh_r1", log=True)
        t_stage.__enter__()
        cm1_np = cm1_np.astype(np.uint64)
        cm1_ext = sync(par.lde_sharded(shard(gl.from_u64_np(cm1_np)),
                                       air.n_bits_ext, mesh))
        tree1 = scheme.merkelize(cm1_ext, air.cm1_width)
        root1 = scheme.root(tree1)
        transcript.put(root1)
        t_stage.__exit__(None, None, None)

        # ---- round 2: host f/t eval + mesh lax.sort split -------------
        t_stage = timer("stark.mesh_r2", log=True)
        t_stage.__enter__()
        challenges[CH_U] = _challenge_triple(transcript)
        challenges[CH_DEFVAL] = _challenge_triple(transcript)

        def env_n():
            secs = {"const": setup.const_n_np, "cm1": cm1_np}
            if cm2_np is not None:
                secs["cm2"] = cm2_np
            return EvalEnv(secs, _host_challenges(challenges),
                           [np.uint64(p) for p in publics],
                           x_n_np, l1_n_np, 1, host=True)

        cm2_np = None
        e = env_n()
        cm2_np = np.zeros((n, air.cm2_width), dtype=np.uint64)
        for pu in air.plookups:
            f_np = _expr_to_np(e, pu.f_exp)
            t_np = _expr_to_np(e, pu.t_exp)
            h1, h2, bad = sync(split_jit(shard(jnp.asarray(f_np)),
                                         shard(jnp.asarray(t_np))))
            assert int(bad) == 0, \
                "plookup: f contains values missing from t"
            d = f_np.shape[1]
            cm2_np[:, pu.h1_col.index:pu.h1_col.index + d] = np.asarray(h1)
            cm2_np[:, pu.h2_col.index:pu.h2_col.index + d] = np.asarray(h2)
        if air.cm2_width:
            cm2_ext = sync(par.lde_sharded(shard(gl.from_u64_np(cm2_np)),
                                           air.n_bits_ext, mesh))
        else:
            cm2_ext = gl.zeros((n_ext, 0))
        tree2 = scheme.merkelize(cm2_ext, air.cm2_width)
        root2 = scheme.root(tree2)
        transcript.put(root2)
        t_stage.__exit__(None, None, None)

        # ---- round 3: host num/den eval + shard_map grand products ----
        t_stage = timer("stark.mesh_r3", log=True)
        t_stage.__enter__()
        challenges[CH_GAMMA] = _challenge_triple(transcript)
        challenges[CH_BETA] = _challenge_triple(transcript)
        e = env_n()
        gamma = air_mod.Challenge(CH_GAMMA)
        beta = air_mod.Challenge(CH_BETA)
        one_plus_beta = beta + 1
        gb = gamma * one_plus_beta

        z_triples = []
        for pu in air.plookups:
            f, t = pu.f_exp, pu.t_exp
            h1c, h2c = pu.h1_col, pu.h2_col
            num = one_plus_beta * (gamma + f) \
                * (gb + t + beta * air_mod._shift_expr(t))
            den = (gb + h1c + beta * h2c) \
                * (gb + h2c + beta * h1c.shifted())
            z_triples.append((pu.z_col, e.eval_ext(num), e.eval_ext(den)))
        for pe in air.permutations:
            z_triples.append((pe.z_col, e.eval_ext(pe.f_exp + gamma),
                              e.eval_ext(pe.t_exp + gamma)))
        im_fills = []
        for ci in air.connections:
            xx = air_mod.XSymbol()
            num_factors = [c + beta * k * xx + gamma
                           for c, k in zip(ci.cols, ci.k_coeffs)]
            den_factors = [c + beta * s + gamma
                           for c, s in zip(ci.cols, ci.s_cols)]
            if not ci.num_ims:
                num = air_mod.Const(1)
                den = air_mod.Const(1)
                for fn, fd in zip(num_factors, den_factors):
                    num = num * fn
                    den = den * fd
                z_triples.append((ci.z_col, e.eval_ext(num),
                                  e.eval_ext(den)))
            else:
                groups = ci.factor_groups()
                finals = []
                for ims, factors in ((ci.num_ims, num_factors),
                                     (ci.den_ims, den_factors)):
                    vals = [e.eval_ext(fa) for fa in factors]
                    vals = [tuple(np.asarray(c, dtype=np.uint64)
                                  for c in v) for v in vals]
                    prev = None
                    for gi, grp in enumerate(groups):
                        prod = prev
                        for fi in grp:
                            prod = vals[fi] if prod is None \
                                else glh.mul3(prod, vals[fi])
                        im_fills.append((ims[gi], prod))
                        prev = prod
                    finals.append(prev)
                z_triples.append((ci.z_col, finals[0], finals[1]))
        for (col, expr) in air.im_defs:
            k, v = e.eval(expr)
            if k == "base":
                v = np.asarray(v, dtype=np.uint64) \
                    + np.zeros(n, dtype=np.uint64)
                triple = (v, np.zeros(n, dtype=np.uint64),
                          np.zeros(n, dtype=np.uint64))
            else:
                triple = v
            im_fills.append((col, triple))

        cm3_np = np.zeros((n, air.cm3_width), dtype=np.uint64)
        for (col, triple) in im_fills:
            for k in range(3):
                cm3_np[:, col.index + k] = np.asarray(triple[k],
                                                      dtype=np.uint64)
        spec1 = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(par.AXIS))
        for (zcol, num_v, den_v) in z_triples:
            num_d = tuple(jax.device_put(
                np.broadcast_to(np.asarray(c, dtype=np.uint64), (n,)),
                spec1) for c in num_v)
            den_d = tuple(jax.device_put(
                np.broadcast_to(np.asarray(c, dtype=np.uint64), (n,)),
                spec1) for c in den_v)
            z = sync(gp(num_d, den_d))
            for k in range(3):
                cm3_np[:, zcol.index + k] = np.asarray(z[k],
                                                      dtype=np.uint64)
        if air.cm3_width:
            cm3_ext = sync(par.lde_sharded(shard(gl.from_u64_np(cm3_np)),
                                           air.n_bits_ext, mesh))
        else:
            cm3_ext = gl.zeros((n_ext, 0))
        tree3 = scheme.merkelize(cm3_ext, air.cm3_width)
        root3 = scheme.root(tree3)
        transcript.put(root3)
        t_stage.__exit__(None, None, None)

        # ---- round 4: host constraint eval, sharded quotient NTTs -----
        t_stage = timer("stark.mesh_r45", log=True)
        t_stage.__enter__()
        challenges[CH_VC] = _challenge_triple(transcript)
        sections_ext_np = {"const": setup.const_ext_np,
                           "cm1": gl.to_u64_np(cm1_ext),
                           "cm2": gl.to_u64_np(cm2_ext),
                           "cm3": gl.to_u64_np(cm3_ext)}
        cm4_ext_dev = _host_quotient(
            air, setup, sections_ext_np, challenges, publics,
            gl.from_u64_np(x_ext_np), gl.from_u64_np(l1_ext_np),
            gl.from_u64_np(zi_ext_np))
        cm4_ext = sync(shard(cm4_ext_dev))
        tree4 = scheme.merkelize(cm4_ext, air.cm4_width)
        root4 = scheme.root(tree4)
        transcript.put(root4)
        sections_ext_np["cm4"] = gl.to_u64_np(cm4_ext)

        # ---- round 5: host evals + DEEP polynomial --------------------
        challenges[CH_XI] = _challenge_triple(transcript)
        evals = _host_evals(air, sections_ext_np, challenges, blowup)
        for ev in evals:
            transcript.put(ev)
        challenges[CH_V1] = _challenge_triple(transcript)
        challenges[CH_V2] = _challenge_triple(transcript)
        fri_pol_np = _host_fri_pol(air, sections_ext_np, challenges,
                                   evals, x_ext_np)
        fri_pol = tuple(jax.device_put(np.asarray(c, dtype=np.uint64),
                                       spec1) for c in fri_pol_np)
        t_stage.__exit__(None, None, None)

        # ---- FRI: sharded folds + on-device query gathers -------------
        t_stage = timer("stark.mesh_fri", log=True)
        t_stage.__enter__()
        trees_main = [tree1, tree2, tree3, tree4, setup.const_tree]
        sources_main = [cm1_ext, cm2_ext, cm3_ext, cm4_ext,
                        setup.const_ext_np]
        fri_steps_data, final_pol, _ys = fri_mod.prove(
            transcript, fri_pol, air, trees_main, sources_main, scheme)
        t_stage.__exit__(None, None, None)

    return StarkProof(roots=[root1, root2, root3, root4],
                      evals=evals,
                      fri_steps=fri_steps_data,
                      final_pol=final_pol,
                      publics=publics)


# ---------------------------------------------------------------------------
# Host (numpy) eager pipelines — the fast CPU path (see fields/glh.py)
# ---------------------------------------------------------------------------

def _host_challenges(challenges: dict):
    return {s: tuple(np.uint64(int(np.asarray(c))) for c in tri)
            for s, tri in challenges.items()}


def _host_quotient(air, setup, sections_ext_np, challenges, publics,
                   x_ext, l1_ext, zi_ext):
    from ..fields import glh
    from .eval import count_refs
    n, n_ext = air.n, air.n_ext
    blowup = n_ext // n
    roots = list(air_mod.all_constraints(air))
    env = EvalEnv(sections_ext_np, _host_challenges(challenges),
                  [np.uint64(p) for p in publics], gl.to_u64_np(x_ext),
                  gl.to_u64_np(l1_ext), blowup, host=True,
                  refcounts=count_refs(roots))
    ch = _host_challenges(challenges)
    vc = ch[CH_VC]
    acc = None
    for c in roots:
        val = env.eval(c)
        if val[0] == "base":
            val3 = glh.from_base3(np.broadcast_to(
                np.asarray(val[1], dtype=np.uint64), (n_ext,)))
        else:
            val3 = tuple(np.broadcast_to(np.asarray(v, dtype=np.uint64),
                                         (n_ext,)) for v in val[1])
        acc = val3 if acc is None else glh.add3(glh.mul3(acc, vc), val3)
    zi = gl.to_u64_np(zi_ext)
    q_vals = tuple(glh.mul(c, zi) for c in acc)
    q_coeffs = gl.to_u64_np(ntt.intt(
        gl.from_u64_np(np.stack(q_vals, axis=1)), air.n_bits_ext))
    shift_inv = gl.host_inv(gl.SHIFT)
    shift_in = pow(shift_inv, n, P)
    parts = []
    cur_s = 1
    import jax.numpy as jnp
    for p_i in range(air.q_deg):
        chunk = glh.mul_const(q_coeffs[p_i * n:(p_i + 1) * n], cur_s)
        cur_s = (cur_s * shift_in) % P
        chunk = np.pad(chunk, ((0, n_ext - n), (0, 0)))
        parts.append(ntt.ntt(gl.from_u64_np(chunk), air.n_bits_ext))
    return jnp.concatenate(parts, axis=1)


def _host_evals(air, sections_ext_np, challenges, blowup):
    """Evaluations at w^shift * xi via INTT-weighted inner products."""
    from ..fields import glh
    ch = _host_challenges(challenges)
    xi = ch[CH_XI]
    w_n = gl.host_w(air.n_bits)
    shift_inv = gl.host_inv(gl.SHIFT)
    shifts = sorted({e.shift for e in air.ev_map})
    weights_by_shift = {}
    for s_ in shifts:
        mulk = (pow(w_n, s_, P) * shift_inv) % P
        pt = tuple(int(c) * mulk % P for c in (int(xi[0]), int(xi[1]),
                                               int(xi[2])))
        w3 = _lagrange_weights(pt, air.n_bits)
        weights_by_shift[s_] = tuple(gl.to_u64_np(c) for c in w3)
    evals = []
    for entry in air.ev_map:
        sec = sections_ext_np[entry.section]
        samp = sec[::blowup]
        weights = weights_by_shift[entry.shift]
        if entry.dim == 1:
            col = samp[:, entry.index]
            prod = tuple(glh.mul(wc, col) for wc in weights)
        else:
            col3 = tuple(samp[:, entry.index + k] for k in range(3))
            prod = glh.mul3(weights, col3)
        evals.append([int(glh.sum_axis(c)) for c in prod])
    return evals


def _host_fri_pol(air, sections_ext_np, challenges, evals, x_ext_np):
    from ..fields import glh
    ch = _host_challenges(challenges)
    xi, v1, v2 = ch[CH_XI], ch[CH_V1], ch[CH_V2]
    n_ext = air.n_ext
    w_n = gl.host_w(air.n_bits)
    shifts = sorted({e.shift for e in air.ev_map})
    accs = {s_: glh.zeros3((n_ext,)) for s_ in shifts}
    v1_pow = (np.uint64(1), np.uint64(0), np.uint64(0))
    for i, entry in enumerate(air.ev_map):
        sec = sections_ext_np[entry.section]
        if entry.dim == 1:
            colv = glh.from_base3(sec[:, entry.index])
        else:
            colv = tuple(sec[:, entry.index + k] for k in range(3))
        ev3 = tuple(np.uint64(evals[i][k]) for k in range(3))
        term = glh.mul3(glh.sub3(colv, ev3), v1_pow)
        accs[entry.shift] = glh.add3(accs[entry.shift], term)
        v1_pow = glh.mul3(v1_pow, v1)
    fri_pol = glh.zeros3((n_ext,))
    v2_pow = (np.uint64(1), np.uint64(0), np.uint64(0))
    for s_ in shifts:
        mulk = pow(w_n, s_, P)
        pt = tuple(np.uint64(int(c) * mulk % P) for c in xi)
        diff = glh.sub3(glh.from_base3(x_ext_np), pt)
        xdiv = glh.mul3_base(glh.inv3(diff), x_ext_np)
        fri_pol = glh.add3(fri_pol,
                           glh.mul3(glh.mul3(accs[s_], xdiv), v2_pow))
        v2_pow = glh.mul3(v2_pow, v2)
    return fri_pol


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _host3_scale(a3, s: int):
    return [(v * s) % P for v in a3]


def _lagrange_weights(point3, n_bits: int):
    """INTT of the geometric series [point^k]_{k<N} (reference LEv/LpEv)."""
    n = 1 << n_bits
    series = gl3.powers_device(gl3.from_ints(*point3), n)
    cols = gl3.stack_cols(series)       # (n, 3)
    coeffs = ntt.intt(cols, n_bits)
    return gl3.from_cols(coeffs)


def _x_div_x_sub(x_ext, point3):
    """x / (x - point) over the extended domain (batch-inverted)."""
    pt = gl3.from_ints(*point3)
    diff = gl3.sub(gl3.from_base(x_ext), pt)
    inv = gl3.batch_inv(diff)
    return gl3.mul_base(inv, x_ext)


def _challenges_array(challenges: dict):
    """dict slot -> gl3 triple  =>  (8, 3) uint64 device array."""
    import jax.numpy as jnp
    rows = []
    for s in range(8):
        tri = challenges.get(s)
        if tri is None:
            rows.append(jnp.zeros(3, dtype=jnp.uint64))
        else:
            rows.append(jnp.stack([jnp.asarray(c).reshape(()) for c in tri]))
    return jnp.stack(rows)


def _round5_with(jits, setup, sections_ext, challenges, publics_arr, x_ext,
                 l1_ext, phase="both", evals_arr=None):
    return jits["round5"](sections_ext["const"], sections_ext["cm1"],
                          sections_ext["cm2"], sections_ext["cm3"],
                          sections_ext["cm4"], _challenges_array(challenges),
                          publics_arr, x_ext, l1_ext, phase=phase,
                          evals_arr=evals_arr)
