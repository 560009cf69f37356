"""Native fast-execution driver (ctypes glue for native/nexec.cpp).

The reference answers executor latency with generated C++
(main_exec_generated_fast.cpp via src/main_generator/); here the ROM is
pre-decoded into flat arrays interpreted by a native core, with lines that
need the command evaluator / storage / hashing dispatched back to the
Python interpreter on shared state.  `NativeMainExecutor.execute` is a
drop-in for `MainExecutor.execute` on the fast (no-trace) path; runs fall
back to pure Python automatically if the library is not built
(tools/build_native.sh).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from ..utils.zkresult import ZkError, ZkResult
from .main_sm import Context, MainExecutor, ZERO8
from .rom import IN_FIELDS, SET_FIELDS, Rom

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "libnexec.so")

# flag bits (must mirror native/nexec.cpp)
F_MOP, F_MWR, F_USECTX, F_ISSTACK, F_ISMEM, F_IND, F_INDRR = \
    (1 << i for i in range(7))
F_JMP, F_JMPC, F_JMPN, F_JMPZ, F_CALL, F_RETURN, F_USEJMPADDR, F_USEELSE = \
    (1 << i for i in range(7, 15))
F_ASSERT, F_BIN, F_EQ0, F_REPEAT, F_HASCONST, F_HASCONSTL, F_PYLINE, \
    F_FREE_DEFAULT, F_INFREE, F_INFREE0 = (1 << i for i in range(15, 25))
F_EQ1, F_EQ2, F_FN, F_EXPR, F_HASHA, F_SRD, F_SWR = \
    (1 << i for i in range(25, 32))

# shared-state slot indices (must mirror native/nexec.cpp)
S_A, S_B, S_C, S_D, S_E, S_SR = 0, 8, 16, 24, 32, 40
(S_CTX, S_SP, S_PC, S_GAS, S_RR, S_HASHPOS, S_RCX, S_ZKPC, S_CARRY,
 S_STEP) = range(48, 58)
(S_CNT_STEPS, S_CNT_ARITH, S_CNT_BINARY, S_CNT_KECCAK, S_CNT_SHA,
 S_CNT_MEMALIGN, S_CNT_PADPG, S_CNT_POSG) = range(58, 66)
(S_LIM_STEPS, S_LIM_ARITH, S_LIM_BINARY, S_LIM_KECCAK, S_LIM_SHA,
 S_LIM_MEMALIGN, S_LIM_PADPG, S_LIM_POSG) = range(66, 74)
S_SIZE = 80

P = (1 << 64) - (1 << 32) + 1

# ---- native expression bytecode (must mirror native/nexec.cpp) -----------
(EX_END, EX_NUM, EX_REG, EX_ADD, EX_SUB, EX_MUL, EX_DIV, EX_MOD, EX_BAND,
 EX_BOR, EX_BXOR, EX_SHL, EX_SHR, EX_LT, EX_GT, EX_EQ, EX_NE, EX_NOT,
 EX_BITNOT, EX_MEM, EX_VAR) = range(21)

_EX_BINOPS = {
    "add": EX_ADD, "sub": EX_SUB, "mul": EX_MUL, "div": EX_DIV,
    "mod": EX_MOD, "and": EX_BAND, "bitand": EX_BAND, "or": EX_BOR,
    "bitor": EX_BOR, "xor": EX_BXOR, "bitxor": EX_BXOR, "shl": EX_SHL,
    "shr": EX_SHR, "lt": EX_LT, "gt": EX_GT, "eq": EX_EQ, "ne": EX_NE,
}
_EX_REGS = {"A": 0, "B": 1, "C": 2, "D": 3, "E": 4, "SR": 5, "CTX": 6,
            "SP": 7, "PC": 8, "GAS": 9, "RR": 10, "HASHPOS": 11,
            "RCX": 12, "STEP": 13}

# register-form functionCalls evaluated natively (fn ids mirror nexec.cpp).
# The native core reads the points from fixed registers, so the params must
# be exactly the getReg forms the ROM uses (A,B[,C,D]); anything else stays
# on the Python path.
_NATIVE_FNS = {"xAddPointEc": 1, "yAddPointEc": 2, "xDblPointEc": 3,
               "yDblPointEc": 4, "inverseFpEc": 5}
FN_GETTXS, FN_GETTXSLEN = 6, 7
_FN_PARAM_REGS = {1: ("A", "B", "C", "D"), 2: ("A", "B", "C", "D"),
                  3: ("A", "B"), 4: ("A", "B"), 5: ("A",)}


def _fn_params_match(fn: int, params) -> bool:
    want = _FN_PARAM_REGS[fn]
    if not params:
        return True        # register defaults (rom_functions fallback)
    if len(params) != len(want):
        return False
    return all(p.get("op") == "getReg" and p.get("regName") == r
               for p, r in zip(params, want))


def compile_expr(cmd: dict, var_slots=None):
    """Command tree -> postfix u64 bytecode, or None if outside the
    native envelope (only number/getReg/getMemValue — plus getVar when a
    slot map is provided — and pure-arithmetic ops; nested calls stay on
    the Python path).  `var_slots` assigns a mirror slot per referenced
    zkasm var; the executor keeps those slots current through a
    write-through vars dict."""
    out = []

    def emit(tree) -> bool:
        op = tree.get("op")
        if op == "getVar" and var_slots is not None:
            slot = var_slots.setdefault(tree["varName"], len(var_slots))
            out.extend((EX_VAR, slot))
            return True
        if op == "number":
            v = int(tree["num"])
            if not (0 <= v < (1 << 256)):
                return False
            out.append(EX_NUM)
            out.extend((v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
                       for k in range(4))
            return True
        if op == "getReg":
            code = _EX_REGS.get(tree.get("regName"))
            if code is None:
                return False
            out.extend((EX_REG, code))
            return True
        if op == "getMemValue":
            out.extend((EX_MEM, int(tree["offset"])))
            return True
        if op in ("not", "bitnot"):
            if not emit(tree["values"][0]):
                return False
            out.append(EX_NOT if op == "not" else EX_BITNOT)
            return True
        code = _EX_BINOPS.get(op)
        vals = tree.get("values", ())
        if code is None or len(vals) not in (1, 2):
            return False
        if not emit(vals[0]):
            return False
        if len(vals) == 2:
            if not emit(vals[1]):
                return False
        else:                      # _binop pads a missing operand with 0
            out.extend((EX_NUM, 0, 0, 0, 0))
        out.append(code)
        return True

    if not emit(cmd):
        return None
    out.append(EX_END)
    return out

_STEP_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64,
                            ctypes.c_uint64)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    from ..native import ensure_built
    ensure_built(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.nexec_new.restype = ctypes.c_void_p
    lib.nexec_new.argtypes = [
        ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, u64p, _STEP_CB, ctypes.c_void_p]
    lib.nexec_free.argtypes = [ctypes.c_void_p]
    lib.nexec_run.restype = ctypes.c_int
    lib.nexec_run.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                              ctypes.c_int64, ctypes.c_uint64]
    lib.nexec_mem_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64, u64p]
    lib.nexec_mem_set.argtypes = [ctypes.c_void_p, ctypes.c_uint64, u64p]
    lib.nexec_set_batch_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_uint64]
    lib.nexec_set_var_block.argtypes = [ctypes.c_void_p, u64p,
                                        ctypes.c_uint64]
    lib.nexec_hash_drain.restype = ctypes.c_int64
    lib.nexec_hash_drain.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_uint64]
    lib.nexec_set_poseidon.argtypes = [ctypes.c_void_p]
    lib.nexec_smt_write.argtypes = [ctypes.c_void_p, u64p, u64p,
                                    ctypes.c_uint64]
    lib.nexec_smt_log_len.restype = ctypes.c_uint64
    lib.nexec_smt_log_len.argtypes = [ctypes.c_void_p]
    lib.nexec_smt_drain.argtypes = [ctypes.c_void_p, u64p]
    # inject the Poseidon permutation from libzkcrypto (one source of
    # truth for the constants; the SMT node hashing runs fully native)
    from ..native import _load as _zk_load
    zk = _zk_load()
    if zk is not None:
        lib.nexec_set_poseidon(
            ctypes.cast(zk.poseidon_permute, ctypes.c_void_p))
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _tree_reads(tree, regs: set, flags: list):
    """Collect getReg names and flag getMemValue in a command tree."""
    if not isinstance(tree, dict):
        return
    op = tree.get("op")
    if op == "getReg":
        regs.add(tree.get("regName"))
    if op == "getMemValue":
        flags.append("mem")
    for v in tree.get("values", ()) or ():
        _tree_reads(v, regs, flags)
    for v in tree.get("params", ()) or ():
        _tree_reads(v, regs, flags)


def compile_setvar_cmds(line, var_slots):
    """(cmd_before, cmd_after) -> flat u64 cmd blob, or None if any
    command is outside the native envelope (only setVar/declareVar with
    compilable exprs; cmd_after expressions must not observe the line's
    own effects — register setters, implicit RR/RCX updates, memory
    writes — since they are pre-flight evaluated)."""
    halves = []
    for which, cmds in (("before", line.cmd_before or []),
                        ("after", line.cmd_after or [])):
        blob = []
        for cmd in cmds:
            if not isinstance(cmd, dict):
                return None
            op = cmd.get("op")
            if op == "declareVar":
                name = cmd.get("varName")
                expr_code = [EX_NUM, 0, 0, 0, 0, EX_END]
            elif op == "setVar":
                vals = cmd.get("values") or []
                if len(vals) != 2 or vals[0].get("op") != "getVar":
                    return None
                name = vals[0].get("varName")
                expr_code = compile_expr(vals[1], var_slots)
                if expr_code is None:
                    return None
                if which == "after":
                    regs, memflags = set(), []
                    _tree_reads(vals[1], regs, memflags)
                    written = set(line.sets)
                    if line.flag("call"):
                        written.add("RR")
                    if line.flag("repeat"):
                        written.add("RCX")
                    if memflags or (regs & written):
                        return None
            else:
                return None
            if not name:
                return None
            slot = var_slots.setdefault(name, len(var_slots))
            blob.append((slot, expr_code))
        halves.append(blob)
    out = []
    for blob in halves:
        out.append(len(blob))
        for slot, code in blob:
            out.append(slot)
            out.extend(code)
    return out


def decode_rom(rom: Rom):
    """ROM -> flat arrays for the native core."""
    n = len(rom.program)
    flags = np.zeros(n, dtype=np.uint32)
    sets = np.zeros(n, dtype=np.uint32)
    in_used = np.zeros(n, dtype=np.uint32)
    in_coeffs = np.zeros((n, len(IN_FIELDS)), dtype=np.uint64)
    const_limbs = np.zeros((n, 8), dtype=np.uint64)
    offset = np.zeros(n, dtype=np.int64)
    jmp_addr = np.zeros(n, dtype=np.int32)
    else_addr = np.zeros(n, dtype=np.int32)
    bin_opcode = np.zeros(n, dtype=np.uint8)
    fn_id = np.zeros(n, dtype=np.uint8)
    expr_off = np.full(n, -1, dtype=np.int64)
    expr_words = []

    flag_bits = {
        "mOp": F_MOP, "mWR": F_MWR, "useCTX": F_USECTX,
        "isStack": F_ISSTACK, "isMem": F_ISMEM, "ind": F_IND,
        "indRR": F_INDRR, "JMP": F_JMP, "JMPC": F_JMPC, "JMPN": F_JMPN,
        "JMPZ": F_JMPZ, "call": F_CALL, "return": F_RETURN,
        "useJmpAddr": F_USEJMPADDR, "useElseAddr": F_USEELSE,
        "assert": F_ASSERT, "bin": F_BIN, "repeat": F_REPEAT,
    }
    py_flags = ["arithEq3", "arithEq4", "arithEq5",
                "memAlignRD", "memAlignWR",
                "memAlignWR8", "hashKLen", "hashKDigest",
                "hashPLen", "hashPDigest",
                "hashSLen", "hashSDigest", "save", "restore"]
    # hashK/hashS/hashP byte appends run natively (logged, drained into
    # the Python HashStates at callback boundaries — the drain applies
    # hashP's first-byte games on the session); Len/Digest lines need
    # the full session and stay in Python
    hash_append_flags = ["hashK", "hashK1", "hashS", "hashS1",
                         "hashP", "hashP1"]
    var_slots: dict = {}

    cmd_off = np.full(len(rom.program), -1, dtype=np.int64)

    for i, line in enumerate(rom.program):
        fl = 0
        for name, bit in flag_bits.items():
            if line.flag(name):
                fl |= bit
        pyline = False
        cmd_blob = None
        if line.cmd_before or line.cmd_after:
            cmd_blob = compile_setvar_cmds(line, var_slots)
            if cmd_blob is None:
                pyline = True
        pyline = pyline or any(line.flag(f) for f in py_flags)
        hasha = [f for f in hash_append_flags if line.flag(f)]
        if hasha and (pyline or line.flag("mOp")):
            pyline = True
            hasha = []
        # free input with a command tree: native functionCall (register
        # form secp EC math / batch-data getTxs), compiled expression
        # bytecode, or Python
        fit = line.free_in_tag
        if fit is not None and fit.get("op"):
            fname = fit.get("funcName") if fit.get("op") == "functionCall" \
                else None
            fid = _NATIVE_FNS.get(fname) if fname else None
            if fid is not None and _fn_params_match(fid, fit.get("params")):
                fl |= F_FN
                fn_id[i] = fid
            elif fname == "getTxs" and len(fit.get("params") or []) == 2 \
                    and not hasha:
                codes = [compile_expr(p, var_slots)
                         for p in fit["params"]]
                if all(c is not None for c in codes):
                    fl |= F_FN
                    fn_id[i] = FN_GETTXS
                    expr_off[i] = len(expr_words)
                    for c in codes:
                        expr_words.extend(c)
                else:
                    pyline = True
            elif fname == "getTxsLen" and not fit.get("params") \
                    and not hasha:
                fl |= F_FN
                fn_id[i] = FN_GETTXSLEN
            else:
                code = compile_expr(fit, var_slots)
                if code is not None:
                    fl |= F_EXPR
                    expr_off[i] = len(expr_words)
                    expr_words.extend(code)
                else:
                    pyline = True
        if hasha and not pyline:
            # fn_id doubles as the append descriptor (only read under
            # F_HASHA; a native-FN free-in on the same line is excluded
            # above via `not hasha` / F_FN precedence)
            if fl & F_FN:
                pyline = True
            else:
                fl |= F_HASHA
                kind = {"hashK": 0, "hashS": 1, "hashP": 2}[
                    hasha[0].rstrip("1")]
                is1 = 4 if hasha[0].endswith("1") else 0
                fn_id[i] = kind | is1
        any_arith = line.flag("arith") or any(line.flag(f"arithEq{k}")
                                              for k in range(6))
        if any_arith:
            if line.flag("arithEq1"):
                fl |= F_EQ1
            elif line.flag("arithEq2"):
                fl |= F_EQ2
            elif line.flag("arithEq0") or not any(
                    line.flag(f"arithEq{k}") for k in range(1, 6)):
                fl |= F_EQ0
            else:
                pyline = True
        if cmd_blob is not None and not pyline:
            # committed before-writes can't be rolled back, so a line
            # whose body may defer mid-way (FN/EXPR/HASHA) is only
            # native when it has no before-commands
            n_before = cmd_blob[0]
            if n_before > 0 and (fl & (F_FN | F_EXPR | F_HASHA)):
                pyline = True
            else:
                cmd_off[i] = len(expr_words)
                expr_words.extend(cmd_blob)
        is_srd, is_swr = line.flag("sRD"), line.flag("sWR")
        if is_srd or is_swr:
            # native SMT lines must have NO other dispatch hooks: the
            # storage walk has side effects, so the line can never defer
            # mid-way (commands / FN / HASHA combinations stay Python)
            if pyline or cmd_blob is not None \
                    or (fl & (F_FN | F_EXPR | F_HASHA)):
                pyline = True
            else:
                fl |= F_SWR if is_swr else F_SRD
        if pyline:
            fl |= F_PYLINE
            fl &= ~(F_FN | F_EXPR | F_EQ1 | F_EQ2 | F_HASHA | F_SRD | F_SWR)
            cmd_off[i] = -1
        if line.free_in_tag is not None and not line.free_in_tag.get("op"):
            fl |= F_FREE_DEFAULT
        if line.has_const or line.has_constl:
            fl |= F_HASCONSTL
            if line.has_constl:
                c = line.constl % (1 << 256)
                for k in range(8):
                    const_limbs[i, k] = (c >> (32 * k)) & 0xFFFFFFFF
            else:
                const_limbs[i, 0] = line.const % P
        flags[i] = fl
        sbits = 0
        for k, name in enumerate(SET_FIELDS):
            if name in line.sets:
                sbits |= 1 << k
        sets[i] = sbits
        used = 0
        for k, name in enumerate(IN_FIELDS):
            v = line.ins.get(name)
            if v:
                used |= 1 << k
                in_coeffs[i, k] = v % P
        in_used[i] = used
        offset[i] = line.offset
        jmp_addr[i] = line.jmp_addr or 0
        else_addr[i] = line.else_addr or 0
        bin_opcode[i] = line.bin_opcode
    expr_code = np.array(expr_words or [0], dtype=np.uint64)
    return dict(flags=flags, sets=sets, in_used=in_used,
                in_coeffs=in_coeffs, const_limbs=const_limbs,
                offset=offset, jmp_addr=jmp_addr, else_addr=else_addr,
                bin_opcode=bin_opcode, fn_id=fn_id, expr_off=expr_off,
                expr_code=expr_code, cmd_off=cmd_off, var_slots=var_slots)


class _WriteThroughVars(dict):
    """ctx.vars replacement mirroring registered zkasm vars into the
    native block (4 value words + valid flag per slot) so EX_VAR
    expressions read current values; anything outside the 256-bit int
    envelope just invalidates its slot (native defers)."""

    def __init__(self, base, slots, block):
        super().__init__(base)
        self._slots = slots
        self._block = block
        for k, v in base.items():
            self._mirror(k, v)

    def _mirror(self, k, v):
        s = self._slots.get(k)
        if s is None:
            return
        row = self._block[s * 5:s * 5 + 5]
        if isinstance(v, int) and 0 <= v < (1 << 256):
            for j in range(4):
                row[j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
            row[4] = 1
        else:
            row[4] = 0

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        self._mirror(k, v)

    def refresh_from_block(self):
        """Pull native setVar-command writes back into the dict (called
        at every Python re-entry and at run end)."""
        for k, s in self._slots.items():
            row = self._block[s * 5:s * 5 + 5]
            if row[4]:
                v = (int(row[0]) | (int(row[1]) << 64) |
                     (int(row[2]) << 128) | (int(row[3]) << 192))
                if dict.get(self, k) != v:
                    dict.__setitem__(self, k, v)


class _NativeMem:
    """dict-like Context.mem backed by the native map."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._h = handle
        self._buf = (ctypes.c_uint64 * 8)()

    def get(self, addr, default=None):
        self._lib.nexec_mem_get(self._h, int(addr), self._buf)
        return [int(v) for v in self._buf]

    def __getitem__(self, addr):
        return self.get(addr)

    def __setitem__(self, addr, val):
        buf = (ctypes.c_uint64 * 8)(*[int(v) % P for v in val])
        self._lib.nexec_mem_set(self._h, int(addr), buf)

    def __contains__(self, addr):
        return True      # reads of absent addresses return zeros


_ERR_NAMES = {
    -1: "max steps", -2: "assert fails", -3: "memory read mismatch",
    -4: "binary check fails", -5: "arith check fails", -6: "fea2scalar",
    -7: "JMPN invalid S33 value", -8: "callback error",
    -9: "address out of range", -10: "out of counters: binary",
    -11: "out of counters: arith", -12: "out of counters: poseidon",
}
_OOC_RESULTS = {-10: ZkResult.OUT_OF_COUNTERS_BINARY,
                -11: ZkResult.OUT_OF_COUNTERS_ARITH,
                -12: ZkResult.OUT_OF_COUNTERS_POSEIDON}


def _smt_snapshot(hashdb, batch_uuid):
    """Full node map for the native SMT store, or None when the backing
    store shape is unknown (native storage then defers per step)."""
    store_fn = getattr(hashdb, "_store", None)
    if store_fn is None:
        return None
    nodes = {}
    db = hashdb.db
    backend = getattr(db, "backend", None)
    if backend is not None and hasattr(backend, "nodes"):
        nodes.update(backend.nodes)
        mw = getattr(db, "multi_write", None)
        if mw is not None:
            with mw.lock:
                for (gen_nodes, _progs) in mw.sealed.values():
                    nodes.update(gen_nodes)
                nodes.update(mw.pending_nodes)
    elif hasattr(db, "nodes"):
        nodes.update(db.nodes)
    else:
        return None
    overlay = hashdb.batches.get(batch_uuid)
    if overlay is not None:
        nodes.update(overlay.overlay)
    return nodes


class NativeMainExecutor:
    """Drop-in MainExecutor for the fast path, native-core driven."""

    def __init__(self, rom: Rom, max_steps: int = 1 << 23):
        self.rom = rom
        self.max_steps = max_steps
        self.py = MainExecutor(rom, max_steps=max_steps)
        self.functions = self.py.functions
        self._arrays = decode_rom(rom)
        self._lib = _load()
        assert self._lib is not None, \
            "libnexec.so not built (tools/build_native.sh)"

    def execute(self, ctx: Context, start_label: str = "start",
                stop_label: Optional[str] = "finalizeExecution"):
        lib = self._lib
        a = self._arrays
        state = np.zeros(S_SIZE, dtype=np.uint64)
        cb_error = []

        start_pc = self.rom.label(start_label) if start_label else 0
        stop_pc = self.rom.labels.get(stop_label, -1) if stop_label else -1

        # push initial registers
        regs = ctx.regs
        self._push(state, ctx)

        handle_box = []

        u64p = ctypes.POINTER(ctypes.c_uint64)
        smt_box = {"store": None, "seen": 0}

        def _smt_sync_from_native():
            """Drain natively-written SMT nodes into the Python overlay
            (py-line reads + post-run consolidation see them)."""
            store = smt_box["store"]
            if store is None:
                return
            n = int(lib.nexec_smt_log_len(handle_box[0]))
            if n:
                buf = np.empty(n * 16, dtype=np.uint64)
                lib.nexec_smt_drain(handle_box[0],
                                    buf.ctypes.data_as(u64p))
                for i in range(n):
                    rec = buf[i * 16:(i + 1) * 16]
                    store.write(tuple(int(v) for v in rec[:4]),
                                [int(v) for v in rec[4:16]])
            smt_box["seen"] = len(store.overlay)

        def _smt_push_new():
            """Push Python-written overlay nodes into the C store (a
            deferred storage line keeps both sides coherent)."""
            store = smt_box["store"]
            if store is None:
                return
            items = list(store.overlay.items())
            if len(items) > smt_box["seen"]:
                new = items[smt_box["seen"]:]
                keys = np.array([list(k) for (k, _v) in new],
                                dtype=np.uint64).reshape(-1)
                vals = np.array([list(v) for (_k, v) in new],
                                dtype=np.uint64).reshape(-1)
                lib.nexec_smt_write(handle_box[0],
                                    keys.ctypes.data_as(u64p),
                                    vals.ctypes.data_as(u64p), len(new))
                smt_box["seen"] = len(items)

        @_STEP_CB
        def cb(_user, zkpc, step):
            try:
                self._pull(state, ctx)
                self._drain_hashes(lib, handle_box[0], ctx)
                _smt_sync_from_native()
                if isinstance(ctx.vars, _WriteThroughVars):
                    ctx.vars.refresh_from_block()
                ctx.step = int(step)
                line = self.rom.program[int(zkpc)]
                self.py.execute_line(ctx, line, int(step))
                self._push(state, ctx)
                _smt_push_new()
                return 0
            except Exception as e:  # noqa: BLE001 - crosses the C boundary
                cb_error.append(e)
                return 1

        handle = lib.nexec_new(
            len(self.rom.program),
            a["flags"].ctypes.data_as(ctypes.c_void_p),
            a["sets"].ctypes.data_as(ctypes.c_void_p),
            a["in_used"].ctypes.data_as(ctypes.c_void_p),
            a["in_coeffs"].ctypes.data_as(ctypes.c_void_p),
            a["const_limbs"].ctypes.data_as(ctypes.c_void_p),
            a["offset"].ctypes.data_as(ctypes.c_void_p),
            a["jmp_addr"].ctypes.data_as(ctypes.c_void_p),
            a["else_addr"].ctypes.data_as(ctypes.c_void_p),
            a["bin_opcode"].ctypes.data_as(ctypes.c_void_p),
            a["fn_id"].ctypes.data_as(ctypes.c_void_p),
            a["expr_off"].ctypes.data_as(ctypes.c_void_p),
            a["expr_code"].ctypes.data_as(ctypes.c_void_p),
            a["cmd_off"].ctypes.data_as(ctypes.c_void_p),
            state.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cb, None)
        handle_box.append(handle)
        try:
            ctx.mem = _NativeMem(lib, handle)
            ctx.max_steps = self.max_steps
            # zkasm var mirror + batch data for the native getTxs /
            # hashK/hashS append paths
            slots = self._arrays["var_slots"]
            var_block = np.zeros(max(1, len(slots)) * 5, dtype=np.uint64)
            lib.nexec_set_var_block(
                handle,
                var_block.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint64)),
                len(slots))
            ctx.vars = _WriteThroughVars(ctx.vars, slots, var_block)
            from .rom_functions import _batch_data
            data = _batch_data(ctx)
            lib.nexec_set_batch_data(handle, data, len(data))
            # native SMT: preload the full node set (base + overlay);
            # unknown store shapes leave the C store empty and storage
            # lines defer to Python per step (bit-identical path)
            nodes = _smt_snapshot(ctx.hashdb, ctx.batch_uuid)
            if nodes is not None and len(nodes):
                keys = np.array([list(k) for k in nodes.keys()],
                                dtype=np.uint64).reshape(-1)
                vals = np.array([list(v) for v in nodes.values()],
                                dtype=np.uint64).reshape(-1)
                lib.nexec_smt_write(handle, keys.ctypes.data_as(u64p),
                                    vals.ctypes.data_as(u64p), len(nodes))
                smt_box["store"] = ctx.hashdb._store(ctx.batch_uuid)
                smt_box["seen"] = len(smt_box["store"].overlay)
            rc = lib.nexec_run(handle, start_pc, stop_pc, self.max_steps)
            if not cb_error:
                self._drain_hashes(lib, handle, ctx)
                _smt_sync_from_native()
                ctx.vars.refresh_from_block()
            if cb_error:
                raise cb_error[0]
            if rc != 1:
                if rc == -1:
                    raise ZkError(ZkResult.OUT_OF_COUNTERS_STEP,
                                  "max steps reached")
                if rc in _OOC_RESULTS:
                    raise ZkError(_OOC_RESULTS[rc], _ERR_NAMES[rc])
                raise ZkError(ZkResult.PROVER_ERROR,
                              f"native executor: "
                              f"{_ERR_NAMES.get(rc, rc)} at zkPC="
                              f"{int(state[S_ZKPC])}")
            self._pull(state, ctx)
            ctx.done = True
            return ctx
        finally:
            # keep a plain-dict snapshot of memory semantics for callers
            lib.nexec_free(handle)
            if isinstance(ctx.mem, _NativeMem):
                ctx.mem = {}

    # -- native hash append log -> ctx.hash_k/hash_s ----------------------
    @staticmethod
    def _drain_hashes(lib, handle, ctx):
        """Apply natively-logged hashK/hashS byte appends to the Python
        HashStates (exact _do_hash write + reads bookkeeping), keeping the
        sessions current at every Python re-entry."""
        n = int(lib.nexec_hash_drain(handle, None, 0))
        if n <= 0:
            return
        buf = (ctypes.c_uint8 * n)()
        got = int(lib.nexec_hash_drain(handle, buf, n))
        assert got == n
        raw = bytes(buf)
        from .main_sm import HashState
        off = 0
        while off < n:
            kind = raw[off]
            addr = int.from_bytes(raw[off + 1:off + 9], "little")
            zkpc = int.from_bytes(raw[off + 9:off + 17], "little")
            pos = int.from_bytes(raw[off + 17:off + 25], "little")
            size = raw[off + 25]
            data = raw[off + 26:off + 26 + size]
            off += 26 + size
            table = (ctx.hash_k, ctx.hash_s, ctx.hash_p)[kind]
            st = table.setdefault(addr, HashState())
            games = kind == 2
            seeds_zero = (games and pos == 1 and not st.data
                          and not st.first_byte_written)
            st.write(pos, data, zkpc, first_byte_games=games)
            if seeds_zero:
                # the zero placeholder byte is its own singleton read
                # (main_executor.cpp:3000)
                st.reads[0] = 1
            if st.reads.setdefault(pos, size) != size:
                raise ZkError(ZkResult.PROVER_ERROR,
                              f"hash two read sizes at pos {pos}, "
                              f"zkPC={zkpc}")

    # -- state sync ------------------------------------------------------
    @staticmethod
    def _push(state, ctx):
        regs = ctx.regs
        for base, reg in ((S_A, regs.A), (S_B, regs.B), (S_C, regs.C),
                          (S_D, regs.D), (S_E, regs.E), (S_SR, regs.SR)):
            state[base:base + 8] = reg          # values are canonical ints
        state[S_CTX] = regs.CTX % P
        state[S_SP] = regs.SP % P
        state[S_PC] = regs.PC % P
        state[S_GAS] = regs.GAS % P
        state[S_RR] = regs.RR % P
        state[S_HASHPOS] = regs.HASHPOS % P
        state[S_RCX] = regs.RCX % P
        state[S_ZKPC] = regs.zkPC
        state[S_CARRY] = ctx.carry
        c = ctx.counters
        state[S_CNT_STEPS] = c.steps
        state[S_CNT_ARITH] = c.arith
        state[S_CNT_BINARY] = c.binary
        state[S_CNT_KECCAK] = c.keccak_f
        state[S_CNT_SHA] = c.sha256_f
        state[S_CNT_MEMALIGN] = c.mem_align
        state[S_CNT_PADPG] = c.padding_pg
        state[S_CNT_POSG] = c.poseidon_g
        lims = getattr(ctx, "counter_limits", None) or {}
        state[S_LIM_STEPS] = lims.get("steps", 0) or 0
        state[S_LIM_ARITH] = lims.get("arith", 0) or 0
        state[S_LIM_BINARY] = lims.get("binary", 0) or 0
        state[S_LIM_KECCAK] = lims.get("keccak_f", 0) or 0
        state[S_LIM_SHA] = lims.get("sha256_f", 0) or 0
        state[S_LIM_MEMALIGN] = lims.get("mem_align", 0) or 0
        state[S_LIM_PADPG] = lims.get("padding_pg", 0) or 0
        state[S_LIM_POSG] = lims.get("poseidon_g", 0) or 0

    @staticmethod
    def _pull(state, ctx):
        regs = ctx.regs
        for base, name in ((S_A, "A"), (S_B, "B"), (S_C, "C"), (S_D, "D"),
                           (S_E, "E"), (S_SR, "SR")):
            setattr(regs, name, state[base:base + 8].tolist())
        regs.CTX = int(state[S_CTX])
        regs.SP = int(state[S_SP])
        regs.PC = int(state[S_PC])
        regs.GAS = int(state[S_GAS])
        regs.RR = int(state[S_RR])
        regs.HASHPOS = int(state[S_HASHPOS])
        regs.RCX = int(state[S_RCX])
        regs.zkPC = int(state[S_ZKPC])
        ctx.carry = int(state[S_CARRY])
        c = ctx.counters
        c.steps = int(state[S_CNT_STEPS])
        c.arith = int(state[S_CNT_ARITH])
        c.binary = int(state[S_CNT_BINARY])
        c.keccak_f = int(state[S_CNT_KECCAK])
        c.sha256_f = int(state[S_CNT_SHA])
        c.mem_align = int(state[S_CNT_MEMALIGN])
        c.padding_pg = int(state[S_CNT_PADPG])
        c.poseidon_g = int(state[S_CNT_POSG])
