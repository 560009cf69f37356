"""Executor: Main SM run -> secondary-SM trace expansion -> provable trace.

Equivalent of the reference Executor (src/executor/executor.cpp): the Main
SM interpreter produces action vectors (Required); the secondary SM
expanders fill their column groups of the shared-domain composite circuit
(the reference runs the 13 expanders as a pthread DAG over one 751-column
buffer; here each expander is an independent vectorized fill feeding one
AIR).  ``process_batch`` is the fast path (execute only, no trace);
``execute`` returns the full proving payload.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import numpy as np

from ..models.zkevm import binary_sm, composite
from ..state.hashdb import HashDB
from ..utils.log import zklog
from ..utils.timer import timer
from .main_sm import Context, MainExecutor, Required
from .rom import Rom

_OPCODE_NAMES = {v: k for k, v in binary_sm.OPCODES.items()}


@dataclasses.dataclass
class ExecutionResult:
    ctx: Context
    const_np: Optional[np.ndarray] = None
    cm1_np: Optional[np.ndarray] = None
    publics: Optional[list] = None


class Executor:
    """Owns the composite circuit geometry + the Main SM machine."""

    def __init__(self, rom: Rom, n_bits: int = 11, chunk_bits: int = 4,
                 n_queries: int = 4, max_steps: int = 1 << 16):
        self.rom = rom
        self.main = MainExecutor(rom, max_steps=max_steps)
        self.air, self.layout = composite.build(n_bits=n_bits,
                                                chunk_bits=chunk_bits,
                                                n_queries=n_queries)

    @property
    def functions(self) -> Dict[str, Callable]:
        return self.main.functions

    def process_batch(self, hashdb: HashDB, batch_uuid: str = "batch",
                      input_vars: Optional[dict] = None,
                      start_label: str = "start",
                      stop_label: str = "finalizeExecution") -> Context:
        """Fast path: execute only (the sequencer's ProcessBatch)."""
        ctx = Context(self.rom, hashdb, batch_uuid, input_vars)
        with timer("executor.process_batch", log=False):
            self.main.execute(ctx, start_label, stop_label)
        return ctx

    def execute(self, hashdb: HashDB, batch_uuid: str = "batch",
                input_vars: Optional[dict] = None,
                start_label: str = "start",
                stop_label: str = "finalizeExecution") -> ExecutionResult:
        """Full path: execute + expand all SM traces into the composite."""
        ctx = self.process_batch(hashdb, batch_uuid, input_vars,
                                 start_label, stop_label)
        req: Required = ctx.required

        bin_actions = [(_OPCODE_NAMES[op], a, b)
                       for (op, a, b, _res, _carry) in req.binary
                       if op in _OPCODE_NAMES]
        mem_actions = list(req.memory)

        with timer("executor.expand_traces", log=False):
            const_np, cm1_np, results = composite.gen_trace(
                self.air, self.layout, bin_actions, mem_actions)
        zklog.info(f"executor: {ctx.counters.steps} steps, "
                   f"{len(bin_actions)} binary ops, "
                   f"{len(mem_actions)} memory accesses")
        return ExecutionResult(ctx=ctx, const_np=const_np, cm1_np=cm1_np,
                               publics=[])
