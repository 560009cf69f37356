"""Constraint-expression evaluation over whole-column device vectors.

The reference evaluates PIL constraint expressions with ~254 kLoC of
generated C++ (chelpers) batching 4/8 rows via AVX
(zkevm.chelpers.step42ns.parser.cpp).  Here the expression DAG is *traced*
into jnp ops over full columns — XLA fuses the resulting elementwise chains
and vectorizes across all rows; one code path serves every circuit.

Values are tagged ('base', array) or ('ext', triple) so base-field subtrees
don't pay the 3x extension cost; promotion happens exactly at the first mixed
op, like the reference's dim-1/dim-3 operand kinds.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import gl, gl3
from . import air as air_mod
from .air import (BinOp, Challenge, Col, Const, Expr, FirstRowSelector,
                  Public, XSymbol)


class EvalEnv:
    """Evaluation environment for one domain (natural H or extended coset).

    sections: dict name -> (rows, width) uint64 array.
    challenges: dict slot -> gl3 scalar (triple of () arrays).
    publics: list of gl scalars.
    x: (rows,) domain values; l1: (rows,) L1 values.
    shift_rows: row distance of "next" (1 on H, blowup on the ext domain).
    host=True evaluates with the numpy twins (fields.glh) — the fast eager
    CPU path; inputs must then be numpy arrays.
    """

    def __init__(self, sections, challenges, publics, x, l1, shift_rows: int,
                 host: bool = False, refcounts=None):
        self.sections = sections
        self.challenges = challenges
        self.publics = publics
        self.x = x
        self.l1 = l1
        self.shift_rows = shift_rows
        self.host = host
        self._memo = {}
        # shifted-column cache: the same (section, index, shift) appears in
        # many distinct Col nodes; np.roll per node was ~21 s of a 2^14
        # host proof.  Keyed by value, per-env (so traced values never
        # escape a jit scope); unshifted slices are views and not cached.
        self._col_cache = {}
        # bounded memoization: with a refcount map (count_refs over the
        # roots about to be evaluated) an entry is dropped after its last
        # use, so peak memory is the live shared frontier instead of every
        # subexpression ever computed — at 2^19+ rows the difference is
        # tens of GB (r3: the 2^18 proof OOM'd at 87 GB without this)
        self._remaining = dict(refcounts) if refcounts else None

    # -- tagged-value helpers -------------------------------------------
    def _add(self, a, b):
        ka, va = a
        kb, vb = b
        if self.host:
            from ..fields import glh
            if ka == "base" and kb == "base":
                return ("base", glh.add(va, vb))
            if ka == "base":
                return ("ext", glh.add3_base(vb, va))
            if kb == "base":
                return ("ext", glh.add3_base(va, vb))
            return ("ext", glh.add3(va, vb))
        if ka == "base" and kb == "base":
            return ("base", gl.add(va, vb))
        if ka == "base":
            return ("ext", gl3.add_base(vb, va))
        if kb == "base":
            return ("ext", gl3.add_base(va, vb))
        return ("ext", gl3.add(va, vb))

    def _sub(self, a, b):
        ka, va = a
        kb, vb = b
        if self.host:
            from ..fields import glh
            if ka == "base" and kb == "base":
                return ("base", glh.sub(va, vb))
            if ka == "base":
                return ("ext", glh.base_sub3(va, vb))
            if kb == "base":
                return ("ext", glh.sub3_base(va, vb))
            return ("ext", glh.sub3(va, vb))
        if ka == "base" and kb == "base":
            return ("base", gl.sub(va, vb))
        if ka == "base":
            return ("ext", gl3.base_sub(va, vb))
        if kb == "base":
            return ("ext", gl3.sub_base(va, vb))
        return ("ext", gl3.sub(va, vb))

    def _mul(self, a, b):
        ka, va = a
        kb, vb = b
        if self.host:
            from ..fields import glh
            if ka == "base" and kb == "base":
                return ("base", glh.mul(va, vb))
            if ka == "base":
                return ("ext", glh.mul3_base(vb, va))
            if kb == "base":
                return ("ext", glh.mul3_base(va, vb))
            return ("ext", glh.mul3(va, vb))
        if ka == "base" and kb == "base":
            return ("base", gl.mul(va, vb))
        if ka == "base":
            return ("ext", gl3.mul_base(vb, va))
        if kb == "base":
            return ("ext", gl3.mul_base(va, vb))
        return ("ext", gl3.mul(va, vb))

    # -- evaluation ------------------------------------------------------
    def eval(self, e: Expr):
        """Returns tagged value; vectors broadcast over the domain rows."""
        key = id(e)
        hit = self._memo.get(key)
        if hit is not None and hit[0] is e:
            if self._remaining is not None:
                self._remaining[key] -= 1
                if self._remaining[key] <= 0:
                    del self._memo[key]
            return hit[1]
        v = self._eval(e)
        if self._remaining is None:
            # keep the expr object alive so a GC'd node can't recycle its id
            self._memo[key] = (e, v)
        else:
            rc = self._remaining.get(key, 1)
            if rc > 1:
                self._memo[key] = (e, v)
                self._remaining[key] = rc - 1
        return v

    def eval_ext(self, e: Expr):
        """Evaluate and force extension representation (gl3 triple)."""
        k, v = self.eval(e)
        if k == "base":
            return gl3.from_base(v)
        return v


    def _col_values(self, c: Col):
        shifted = bool(c.shift and self.shift_rows)
        key = (c.section, c.index, c.dim, c.shift) if shifted else None
        if key is not None:
            hit = self._col_cache.get(key)
            if hit is not None:
                return hit
        sec = self.sections[c.section]
        block = sec[:, c.index:c.index + c.dim]
        if shifted:
            roll = np.roll if self.host else jnp.roll
            block = roll(block, -c.shift * self.shift_rows, axis=0)
        if c.dim == 1:
            res = ("base", block[:, 0])
        else:
            res = ("ext", tuple(block[:, k] for k in range(3)))
        if key is not None:
            self._col_cache[key] = res
        return res

    def _eval(self, e: Expr):
        if isinstance(e, Col):
            return self._col_values(e)
        if isinstance(e, Const):
            v = e.value % gl.P
            return ("base", np.uint64(v) if self.host else jnp.uint64(v))
        if isinstance(e, Challenge):
            return ("ext", self.challenges[e.index])
        if isinstance(e, Public):
            return ("base", self.publics[e.index])
        if isinstance(e, XSymbol):
            return ("base", self.x)
        if isinstance(e, FirstRowSelector):
            return ("base", self.l1)
        if isinstance(e, BinOp):
            a = self.eval(e.a)
            b = self.eval(e.b)
            if e.op == "add":
                return self._add(a, b)
            if e.op == "sub":
                return self._sub(a, b)
            return self._mul(a, b)
        raise TypeError(type(e))


# ---------------------------------------------------------------------------
# Host-side scalar evaluation (python ints in the cubic extension) — used by
# the verifier to evaluate constraints at xi from the proof's evals.
# ---------------------------------------------------------------------------

class ScalarEnv:
    """Col -> gl3 value from the proof evals; everything in python ints."""

    def __init__(self, air, evals, challenges, publics, xi, l1_xi):
        # evals: dict (section, index, shift) -> [e0, e1, e2]
        self.air = air
        self.evals = evals
        self.challenges = challenges
        self.publics = publics
        self.xi = xi            # [3]
        self.l1_xi = l1_xi      # [3]
        self._memo = {}

    def eval(self, e: Expr):
        key = id(e)
        hit = self._memo.get(key)
        if hit is not None and hit[0] is e:
            return hit[1]
        v = self._eval(e)
        # keep the expr object alive so a GC'd node can't recycle its id
        self._memo[key] = (e, v)
        return v

    def _eval(self, e: Expr):
        P = gl.P
        if isinstance(e, Col):
            return list(self.evals[(e.section, e.index, int(e.shift))])
        if isinstance(e, Const):
            return [e.value % P, 0, 0]
        if isinstance(e, Challenge):
            return list(self.challenges[e.index])
        if isinstance(e, Public):
            return [self.publics[e.index] % P, 0, 0]
        if isinstance(e, XSymbol):
            return list(self.xi)
        if isinstance(e, FirstRowSelector):
            return list(self.l1_xi)
        if isinstance(e, BinOp):
            a = self.eval(e.a)
            b = self.eval(e.b)
            if e.op == "add":
                return [(x + y) % P for x, y in zip(a, b)]
            if e.op == "sub":
                return [(x - y) % P for x, y in zip(a, b)]
            return gl3._host_mul3(a, b)
        raise TypeError(type(e))


def count_refs(roots) -> dict:
    """DAG in-degree per node id over the expressions about to be
    evaluated (each unique BinOp parent evaluates once, so one count per
    child slot, plus one per top-level root) — feeds EvalEnv's bounded
    memo.  The caller must keep `roots` alive while the counts are used."""
    counts: dict = {}
    seen = set()
    stack = []
    for r in roots:
        counts[id(r)] = counts.get(id(r), 0) + 1
        stack.append(r)
    while stack:
        e = stack.pop()
        if id(e) in seen:
            continue
        seen.add(id(e))
        if isinstance(e, BinOp):
            for ch in (e.a, e.b):
                counts[id(ch)] = counts.get(id(ch), 0) + 1
                stack.append(ch)
    return counts
