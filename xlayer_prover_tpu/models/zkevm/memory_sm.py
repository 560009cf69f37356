"""Memory SM: provable sorted-access memory-consistency circuit + expander.

Equivalent of the reference Memory SM (src/sm/memory/memory_executor.cpp):
accesses sorted by (addr, step); consistency requires every read to return
the last written value and first reads to see zero.  Circuit design:

  columns (witness): addr, step, is_write, val, last_access
  fixed: RANGE (identity 0..N-1 for delta range checks), ISLAST (domain end)

  constraints (cyclic domain; wrap disabled via ISLAST):
    * last_access is boolean;
    * within a group (last_access=0): addr' = addr, and step delta
      step' - step in [0, N) via plookup into RANGE;
    * group change (last_access=1): addr' - addr - 1 in [0, N);
    * read after write/read in-group: val' = val when is_write' = 0;
    * first access of a new group that is a read sees zero:
      last_access * (1 - is_write') * val' = 0.

The expander sorts executor memory actions into this layout.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...stark.air import AirBuilder, Col, Const


@dataclasses.dataclass
class MemoryLayout:
    fixed: dict
    witness: dict


def build(builder: AirBuilder, n_bits: int) -> MemoryLayout:
    fixed = {
        "RANGE": builder.fixed("MEM_RANGE"),
        "ISLAST": builder.fixed("MEM_ISLAST"),
    }
    w = {
        "addr": builder.witness("mem_addr"),
        "step": builder.witness("mem_step"),
        "is_write": builder.witness("mem_is_write"),
        "val": builder.witness("mem_val"),
        "last_access": builder.witness("mem_last_access"),
        # range-checked deltas (witness; bound by plookup into RANGE)
        "delta": builder.witness("mem_delta"),
    }
    one = Const(1)
    la = w["last_access"]
    wr = w["is_write"]
    addr, step, val = w["addr"], w["step"], w["val"]
    not_wrap = one - fixed["ISLAST"]

    builder.constrain(la * (la - one))                 # boolean
    builder.constrain(wr * (wr - one))                 # boolean
    # in-group: same addr
    builder.constrain(not_wrap * (one - la) * (addr.shifted() - addr))
    # delta definition: in-group -> step'-step ; group change -> addr'-addr-1
    builder.constrain(not_wrap * (
        w["delta"]
        - (one - la) * (step.shifted() - step)
        - la * (addr.shifted() - addr - one)))
    builder.plookup([w["delta"]], [fixed["RANGE"]])
    # read consistency within a group
    builder.constrain(not_wrap * (one - la) * (one - wr.shifted())
                      * (val.shifted() - val))
    # new group starting with a read sees zero
    builder.constrain(not_wrap * la * (one - wr.shifted()) * val.shifted())
    return MemoryLayout(fixed=fixed, witness=w)


def fill_fixed(layout: MemoryLayout, const_np: np.ndarray):
    n = const_np.shape[0]
    const_np[:, layout.fixed["RANGE"].index] = np.arange(n, dtype=np.uint64)
    const_np[n - 1, layout.fixed["ISLAST"].index] = 1


def expand_trace(layout: MemoryLayout, actions, cm1_np: np.ndarray):
    """actions: list of (kind, addr, value, step) from the Main SM
    (Required.memory; kind in {"R","W"}; value as small int here)."""
    n = cm1_np.shape[0]

    def val_of(v):
        # Main SM Required.memory carries 8-limb lists; the single-value
        # circuit column commits limb 0 (full 8-limb columns are the widen
        # step, mirroring the reference's 8 value pols)
        return int(v[0]) if isinstance(v, (list, tuple)) else int(v)

    rows = sorted(((a, s, 1 if k == "W" else 0, val_of(v))
                   for (k, a, v, s) in actions), key=lambda r: (r[0], r[1]))
    assert len(rows) <= n
    w = layout.witness
    # pad remaining rows by repeating the last access at increasing steps
    if rows:
        last = rows[-1]
        pad_needed = n - len(rows)
        rows = rows + [(last[0], last[1] + 1 + i, 0, last[3])
                       for i in range(pad_needed)]
    else:
        rows = [(0, i, 0, 0) for i in range(n)]
    for i, (a, s, iw, v) in enumerate(rows):
        cm1_np[i, w["addr"].index] = a
        cm1_np[i, w["step"].index] = s
        cm1_np[i, w["is_write"].index] = iw
        cm1_np[i, w["val"].index] = v
        nxt = rows[(i + 1) % n]
        la = 1 if nxt[0] != a else 0
        cm1_np[i, w["last_access"].index] = la
        if i < n - 1:
            delta = (nxt[0] - a - 1) if la else (nxt[1] - s)
            assert 0 <= delta < n, f"delta {delta} out of range at row {i}"
            cm1_np[i, w["delta"].index] = delta
