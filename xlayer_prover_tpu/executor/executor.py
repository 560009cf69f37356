"""Executor: Main SM run -> secondary-SM trace expansion -> provable trace.

Equivalent of the reference Executor (src/executor/executor.cpp): the Main
SM interpreter produces per-step trace records plus action vectors
(Required); the trace is committed as the Main SM column group and the
secondary SM expanders fill their column groups of the shared-domain zkEVM
circuit (the reference runs 13 expanders as a pthread DAG over one
751-column buffer, executor.cpp:647-702; here each expander is an
independent vectorized fill feeding one AIR).  ``process_batch`` is the
fast path (execute only, no trace); ``execute`` returns the full proving
payload: const/cm1 numpy columns + publics for stark.prover.gen_proof.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import numpy as np

from ..models.zkevm import zkevm_air
from ..state.hashdb import HashDB
from ..utils.log import zklog
from ..utils.timer import timer
from .main_sm import Context, MainExecutor, Required
from .rom import Rom


@dataclasses.dataclass
class ExecutionResult:
    ctx: Context
    const_np: Optional[np.ndarray] = None
    cm1_np: Optional[np.ndarray] = None
    publics: Optional[list] = None


class Executor:
    """Owns the zkEVM circuit geometry + the Main SM machine."""

    def __init__(self, rom: Rom, n_bits: int = 16, chunk_bits: int = 4,
                 limb_bits: int = 16, n_queries: int = 8,
                 max_steps: int = 1 << 22,
                 start_label: str = "start",
                 stop_label: str = "finalizeExecution",
                 storage_rom=None):
        self.rom = rom
        self.start_label = start_label
        self.stop_label = stop_label
        self.max_steps = max_steps
        self.main = MainExecutor(rom, max_steps=max_steps)
        self._native = None          # lazy NativeMainExecutor (fast path)
        self.air, self.layout = zkevm_air.build(
            rom, n_bits=n_bits, chunk_bits=chunk_bits, limb_bits=limb_bits,
            n_queries=n_queries, start_label=start_label,
            stop_label=stop_label, storage_rom=storage_rom)

    @property
    def functions(self) -> Dict[str, Callable]:
        return self.main.functions

    def _native_main(self):
        """Lazy native fast-path core (reference main_exec_generated_fast
        selection, executor.cpp:498-507); None when libnexec is absent."""
        if self._native is False:
            return None
        if self._native is None:
            try:
                from .nexec import NativeMainExecutor, available
                if not available():
                    self._native = False
                    return None
                nat = NativeMainExecutor(self.rom, max_steps=self.max_steps)
                # share the Python interpreter (and its registered
                # function table) for deferred lines
                nat.py = self.main
                nat.functions = self.main.functions
                self._native = nat
            except Exception:  # noqa: BLE001 - fall back to Python
                self._native = False
                return None
        return self._native

    def process_batch(self, hashdb: HashDB, batch_uuid: str = "batch",
                      input_vars: Optional[dict] = None,
                      trace: bool = False) -> Context:
        """Fast path: execute only (the sequencer's ProcessBatch)."""
        ctx = Context(self.rom, hashdb, batch_uuid, input_vars)
        if trace:
            ctx.trace = []
        engine = self.main if trace else (self._native_main() or self.main)
        with timer("executor.process_batch", log=False):
            engine.execute(ctx, self.start_label, self.stop_label)
        return ctx

    def execute(self, hashdb: HashDB, batch_uuid: str = "batch",
                input_vars: Optional[dict] = None,
                setup_registers=None) -> ExecutionResult:
        """Full path: execute + commit the Main trace + expand all SMs."""
        ctx = Context(self.rom, hashdb, batch_uuid, input_vars)
        ctx.trace = []
        if setup_registers is not None:
            setup_registers(ctx)
        with timer("executor.main_sm", log=False):
            self.main.execute(ctx, self.start_label, self.stop_label)
        req: Required = ctx.required

        from ..models.zkevm.padding_bytes import ByteStreamInput
        from .main_sm import linearize_reads
        for prefix, table, out in (("hashP", ctx.hash_p, req.padding_pg),
                                   ("hashK", ctx.hash_k, req.padding_kk),
                                   ("hashS", ctx.hash_s, req.padding_sha)):
            for addr in sorted(table):
                st = table[addr]
                out.append(ByteStreamInput(
                    addr=addr, data=bytes(st.data),
                    reads=linearize_reads(st, f"{prefix} addr={addr}"),
                    len_called=st.len_called,
                    digest_called=st.digest_called))

        regs = ctx.regs
        final_regs = {
            "A": list(regs.A), "B": list(regs.B), "C": list(regs.C),
            "D": list(regs.D), "E": list(regs.E), "SR": list(regs.SR),
            "CTX": regs.CTX, "SP": regs.SP, "PC": regs.PC, "GAS": regs.GAS,
            "RR": regs.RR, "HASHPOS": regs.HASHPOS, "RCX": regs.RCX,
            "carry": ctx.carry,
            "counters": (ctx.counters.arith, ctx.counters.binary,
                         ctx.counters.keccak_f, ctx.counters.sha256_f,
                         ctx.counters.mem_align, ctx.counters.padding_pg,
                         ctx.counters.poseidon_g),
        }
        with timer("executor.expand_traces", log=False):
            const_np, cm1_np, publics = zkevm_air.gen_trace(
                self.air, self.layout, ctx.trace, final_regs, req)
        zklog.info(f"executor: {ctx.counters.steps} steps, "
                   f"{len(req.binary)} binary ops, "
                   f"{len(req.memory)} memory accesses, "
                   f"{sum(1 for a in req.arith if a[0] == 0)} eq0 ariths")
        return ExecutionResult(ctx=ctx, const_np=const_np, cm1_np=cm1_np,
                               publics=publics)
