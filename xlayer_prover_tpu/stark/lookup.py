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
