"""Stage timing + aggregated metrics (reference: src/utils/timer.hpp,
src/utils/time_metric.hpp).

``timer(label)`` context manager replaces TimerStart/TimerStopAndLog;
``TimeMetrics`` aggregates (count, total) per label like TimeMetricStorage.
On TPU, device work is asynchronous — pass ``sync=jax.block_until_ready``
targets via ``timer(..., block=arrays)`` to time actual execution.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict

from .log import zklog


class TimeMetrics:
    def __init__(self):
        self._lock = threading.Lock()
        self._acc: Dict[str, list] = {}

    def add(self, label: str, seconds: float):
        with self._lock:
            e = self._acc.setdefault(label, [0, 0.0])
            e[0] += 1
            e[1] += seconds

    def print_summary(self, prefix: str = ""):
        with self._lock:
            for label, (n, total) in sorted(self._acc.items(),
                                            key=lambda kv: -kv[1][1]):
                zklog.info(f"{prefix}{label}: n={n} total={total:.3f}s "
                           f"avg={total / max(n, 1) * 1e3:.2f}ms")

    def as_dict(self):
        with self._lock:
            return {k: {"count": n, "total_s": t}
                    for k, (n, t) in self._acc.items()}


metrics = TimeMetrics()


@contextlib.contextmanager
def timer(label: str, block=None, log: bool = True):
    """Time a stage; optionally block on device arrays for true timing."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block is not None:
            import jax
            jax.block_until_ready(block)
        dt = time.perf_counter() - t0
        metrics.add(label, dt)
        if log:
            zklog.info(f"{label}: {dt:.3f} s")
