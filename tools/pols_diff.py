"""Committed-trace diff tool (reference polsDiff,
src/pols_diff/pols_diff.cpp): compare two saved cm-pols dumps
(BatchProver.save_cm_pols .npz files) column by column and report the
first differing rows per column — the debugging workflow for executor
divergence between two builds/runs.

Usage: python tools/pols_diff.py A.npz B.npz [max_reports]
"""

from __future__ import annotations

import sys

import numpy as np


def diff(path_a: str, path_b: str, max_reports: int = 20):
    a = np.load(path_a)
    b = np.load(path_b)
    out = []
    cm_a, cm_b = a["cm1"], b["cm1"]
    if cm_a.shape != cm_b.shape:
        out.append(f"shape mismatch: {cm_a.shape} vs {cm_b.shape}")
        return out
    neq = cm_a != cm_b
    bad_cols = np.nonzero(neq.any(axis=0))[0]
    for col in bad_cols[:max_reports]:
        rows = np.nonzero(neq[:, col])[0]
        out.append(f"col {col}: {len(rows)} rows differ, first at row "
                   f"{rows[0]} ({cm_a[rows[0], col]} vs "
                   f"{cm_b[rows[0], col]})")
    if len(bad_cols) > max_reports:
        out.append(f"... and {len(bad_cols) - max_reports} more columns")
    pa, pb = list(a["publics"]), list(b["publics"])
    if pa != pb:
        out.append(f"publics differ: {pa} vs {pb}")
    return out


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    reports = diff(sys.argv[1], sys.argv[2],
                   int(sys.argv[3]) if len(sys.argv) > 3 else 20)
    if not reports:
        print("OK: traces identical")
        return 0
    for r in reports:
        print(r)
    return 1


if __name__ == "__main__":
    sys.exit(main())
