"""Plookup h1/h2 multiset split.

Behavioral parity with Polinomial::calculateH1H2_ (polinomial.hpp:305-349):
the merged multiset is, for each t-row i in order, t[i] repeated
(1 + #f matching t[i], where f matches the LAST occurrence of its value in
t) times; h1 takes even positions, h2 odd.  Implemented with vectorized
numpy (unique/searchsorted/bincount/repeat); N-row python loops are avoided.
"""

from __future__ import annotations

import numpy as np


class LookupError_(Exception):
    pass


def _as_void(rows: np.ndarray) -> np.ndarray:
    """(N, dim) u64 -> (N,) void view for row-wise matching."""
    rows = np.ascontiguousarray(rows, dtype=np.uint64)
    return rows.view([("", np.uint64)] * rows.shape[1]).reshape(-1)


def calculate_h1h2(f_vals: np.ndarray, t_vals: np.ndarray):
    """f_vals, t_vals: (N, dim) uint64. Returns (h1, h2) each (N, dim)."""
    if f_vals.ndim == 1:
        f_vals = f_vals[:, None]
    if t_vals.ndim == 1:
        t_vals = t_vals[:, None]
    n = t_vals.shape[0]
    assert f_vals.shape[0] == n

    t_keys = _as_void(t_vals)
    f_keys = _as_void(f_vals)

    order = np.argsort(t_keys, kind="stable")
    t_sorted = t_keys[order]
    uniq_mask = np.empty(n, dtype=bool)
    uniq_mask[0] = True
    uniq_mask[1:] = t_sorted[1:] != t_sorted[:-1]
    uniq_starts = np.flatnonzero(uniq_mask)
    uniq_keys = t_sorted[uniq_starts]
    # last occurrence (in original order) per unique key
    group_of_sorted = np.cumsum(uniq_mask) - 1
    last_idx = np.zeros(len(uniq_keys), dtype=np.int64)
    np.maximum.at(last_idx, group_of_sorted, order)

    pos = np.searchsorted(uniq_keys, f_keys)
    bad = (pos >= len(uniq_keys)) | (uniq_keys[np.minimum(pos, len(uniq_keys) - 1)] != f_keys)
    if bad.any():
        i = int(np.flatnonzero(bad)[0])
        raise LookupError_(f"plookup: f value at row {i} not present in t")
    f_t_idx = last_idx[pos]

    counter = np.ones(n, dtype=np.int64)
    np.add.at(counter, f_t_idx, 1)

    merged_idx = np.repeat(np.arange(n, dtype=np.int64), counter)
    assert merged_idx.shape[0] == 2 * n
    h1 = t_vals[merged_idx[0::2]]
    h2 = t_vals[merged_idx[1::2]]
    return h1, h2


# ---------------------------------------------------------------------------
# Device multiset split (TPU): two lax.sorts + a segmented prefix-max.
#
# The host version pulls every compressed lookup column off the device
# (40+ lookups x (N, 3) at zkEVM scale); this computes h1/h2 entirely
# on-device:
#   1) sort (t ++ f) lexicographically by value with t-before-f tie-break;
#      within each equal-value run, forward-propagate the max t row index
#      (= the LAST occurrence in t) with one cummax over run-tagged keys;
#   2) assign each element its merged position key (t row i -> 2i, f copy
#      matched to t row m -> 2m + 1) and sort once more; even positions
#      are h1, odd are h2 — exactly Polinomial::calculateH1H2_'s merge.
# ---------------------------------------------------------------------------

def calculate_h1h2_device(f_vals, t_vals):
    """f_vals/t_vals: (n, dim) uint64 DEVICE arrays.  Returns
    (h1, h2, bad) device arrays; ``bad`` counts f rows missing from t
    (callers aggregate and assert once)."""
    import jax
    import jax.numpy as jnp

    n, dim = t_vals.shape
    assert f_vals.shape == (n, dim)
    two_n = 2 * n

    vals = jnp.concatenate([t_vals, f_vals], axis=0)
    is_f = jnp.concatenate([jnp.zeros(n, jnp.uint64),
                            jnp.ones(n, jnp.uint64)])
    idx = jnp.concatenate([jnp.arange(n, dtype=jnp.uint64)] * 2)

    ops = [vals[:, k] for k in range(dim)] + [is_f, idx]
    srt = jax.lax.sort(tuple(ops), num_keys=dim + 1)
    sv = jnp.stack(srt[:dim], axis=1)
    s_isf = srt[dim]
    s_idx = srt[dim + 1]

    boundary = jnp.concatenate([
        jnp.ones(1, dtype=jnp.uint64),
        jnp.any(sv[1:] != sv[:-1], axis=1).astype(jnp.uint64)])
    run_id = jnp.cumsum(boundary)                       # 1-based
    big = jnp.uint64(two_n + 2)
    t_idx1 = jnp.where(s_isf == 0, s_idx + jnp.uint64(1), jnp.uint64(0))
    tagged = run_id * big + t_idx1
    prefmax = jax.lax.cummax(tagged)
    match1 = prefmax - run_id * big                     # last t idx + 1

    bad = jnp.sum(jnp.where((s_isf == 1) & (match1 == 0),
                            jnp.uint64(1), jnp.uint64(0)))
    # merged position: t row i -> 2i ; f copy after its match -> 2m + 1
    pos = jnp.where(s_isf == 0, s_idx * 2, (match1 - 1) * 2 + 1)
    ops2 = [pos] + [sv[:, k] for k in range(dim)]
    srt2 = jax.lax.sort(tuple(ops2), num_keys=1)
    merged = jnp.stack(srt2[1:], axis=1)
    return merged[0::2], merged[1::2], bad
