"""FRI commit/fold/query phases, device-vectorized.

Behavioral parity with FRIProve::prove (src/starkpil/fri/friProve.cpp:5-190):
per step si the current polynomial values (cubic-extension, on the shifted
coset of size 2^bits) are folded by grouping indices with equal residue mod
2^bits_next, size-nX INTT per group, un-shifting coefficients by powers of
(shift * w^g)^-1, and evaluating at the step's transcript challenge; the
un-folded layer is committed transposed so one Merkle leaf holds exactly the
group a verifier needs.  Everything is batched: the per-group INTT is one
(nX, n_groups*3) transform, the coefficient un-shift is an outer-product
power table, the Horner evaluation is nX-1 vector muls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gl, gl3
from ..ops import merkle, ntt


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _fold_jit(cols, sx, shift_inv: int, w_inv: int, bits: int,
              bits_next: int):
    n = 1 << bits
    n_out = 1 << bits_next
    n_x = n // n_out
    # group g holds indices {g + j*n_out}: element [j, g] after reshape
    grouped = cols.reshape(n_x, n_out * 3)
    coeffs = ntt.intt(grouped, bits - bits_next).reshape(n_x, n_out, 3)
    # un-shift: coeff i of group g scaled by (shift_inv * w_inv^g)^i —
    # row i is base^i with base[g] = shift_inv * w_inv^g, built by n_x
    # cumulative vector muls
    base = gl.mul_const(gl.powers_device(w_inv, n_out), shift_inv)
    rows = [jnp.ones((n_out,), dtype=gl.DTYPE)]
    for _ in range(n_x - 1):
        rows.append(gl.mul(rows[-1], base))
    scale = jnp.stack(rows, axis=0)                   # (n_x, n_out)
    coeffs3 = tuple(gl.mul(coeffs[..., k], scale) for k in range(3))
    # Horner at special_x over i (axis 0)
    acc = tuple(c[n_x - 1] for c in coeffs3)
    for i in range(n_x - 2, -1, -1):
        acc = gl3.mul(acc, sx)
        acc = gl3.add(acc, tuple(c[i] for c in coeffs3))
    return acc


def fold(values, special_x, shift_inv: int, w_inv: int, bits: int,
         bits_next: int):
    """One FRI fold: (2^bits,)-triple -> (2^bits_next,)-triple.

    values: gl3 triple of (2^bits,) arrays (coset evaluations).
    special_x: gl3 scalar triple.  shift_inv/w_inv: python ints for the
    CURRENT domain (inverse coset shift, inverse 2^bits root).  Runs as
    ONE jitted graph per geometry — eager op-by-op folding costs a
    dispatch round-trip per primitive on remote devices.
    """
    cols = gl3.stack_cols(values)                     # (n, 3)
    sx = tuple(jnp.asarray(c).reshape(()) for c in special_x)
    return _fold_jit(cols, sx, int(shift_inv), int(w_inv), bits, bits_next)


def transpose_for_tree(values, bits: int, bits_next: int):
    """Merkle source for the NEXT step's tree: leaf g = its fold group.

    values: gl3 triple of (2^bits,) arrays -> (2^bits_next, group*3) array,
    matching FRIProve::getTransposed + MerkleTreeGL(nGroups, groupSize*3).
    """
    n = 1 << bits
    n_groups = 1 << bits_next
    group = n // n_groups
    cols = gl3.stack_cols(values)  # (n, 3)
    return cols.reshape(group, n_groups, 3).transpose(1, 0, 2).reshape(
        n_groups, group * 3)


def prove(transcript, fri_pol, air, trees_main_np, sources_main_np,
          scheme=None):
    """FRI commit + query phases.

    fri_pol: gl3 triple of (n_ext,) arrays.
    trees_main_np/sources_main_np: the 5 main trees (MerkleTree) and their
    numpy sources for query openings (cm1..cm4, const order).
    Returns (fri_steps_data, final_pol_np) for the proof.
    """
    from .commitment import get_scheme
    from .proof import FriStep, MerkleProofData
    if scheme is None:
        scheme = get_scheme(air)

    P = gl.P
    steps = air.fri_steps
    shift_inv = gl.host_inv(gl.SHIFT)
    pol_bits = steps[0]

    layer = fri_pol
    fri_trees = [None]        # tree for step si >= 1
    fri_sources = [None]
    roots = [None]

    from ..utils.sync import sync
    for si in range(len(steps)):
        special_x = transcript.get_field()
        sx = gl3.from_ints(*special_x)
        if si > 0:
            w_inv = gl.host_inv(gl.host_w(pol_bits))
            layer = sync(fold(layer, sx, shift_inv, w_inv, pol_bits,
                              steps[si]))
            reduction = pol_bits - steps[si]
            for _ in range(reduction):
                shift_inv = (shift_inv * shift_inv) % P
            pol_bits = steps[si]
        if si < len(steps) - 1:
            src = sync(transpose_for_tree(layer, steps[si], steps[si + 1]))
            tree = scheme.merkelize(src, src.shape[1])
            fri_trees.append(tree)
            fri_sources.append(src)     # device or host; queried batched
            root = scheme.root(tree)
            roots.append(root)
            transcript.put(root)
        else:
            final_np = gl3.to_u64_np(layer)  # (2^last, 3)
            for row in final_np:
                transcript.put([int(v) for v in row])

    n_queries = air.n_queries
    ys = transcript.get_permutations(n_queries, steps[0])

    fri_steps_data = []
    for si in range(len(steps)):
        idxs = [y % (1 << steps[si]) for y in ys]
        if si == 0:
            per_tree = [_open_many(scheme, tree, src, idxs)
                        for tree, src in zip(trees_main_np,
                                             sources_main_np)]
            queries = [[pt[qi] for pt in per_tree]
                       for qi in range(len(idxs))]
        else:
            opened = _open_many(scheme, fri_trees[si], fri_sources[si],
                                idxs)
            queries = [[opened[qi]] for qi in range(len(idxs))]
        fri_steps_data.append(FriStep(root=roots[si] if si > 0 else None,
                                      queries=queries))
    return fri_steps_data, [[int(v) for v in row] for row in final_np], ys


def _open_many(scheme, tree, source, idxs):
    """All query openings of one tree, batched: one row gather + one
    sibling-path gather (a single host pull each) instead of a device
    round-trip per (query, level) — the remote-tunnel-friendly shape of
    FRIProve::queryPol (friProve.cpp:153-178)."""
    from .proof import MerkleProofData
    batch = getattr(scheme, "open_many", None)
    if batch is not None:
        pairs = batch(tree, source, idxs)
    else:
        pairs = [scheme.open(tree, source, i) for i in idxs]
    return [MerkleProofData(values=v, siblings=s) for v, s in pairs]
