"""ctypes bindings for the native host crypto library (libzkcrypto.so).

The library is optional: every entry point has a pure-python fallback, so
the framework runs without a compiled artifact (build with
tools/build_native.sh).  Poseidon parameters are injected at load from
ops/poseidon_constants.py so native and python paths share one source.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libzkcrypto.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.keccak256.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                              ctypes.POINTER(ctypes.c_uint8)]
    lib.poseidon_init.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                                  ctypes.POINTER(ctypes.c_uint64),
                                  ctypes.c_int, ctypes.c_int]
    lib.poseidon_permute.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    lib.poseidon_permute.restype = ctypes.c_int
    lib.poseidon_permute_batch.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                                           ctypes.c_uint64]
    lib.poseidon_permute_batch.restype = ctypes.c_int

    from ..ops import poseidon_constants as pc
    consts, mds, _ = pc.get_params()
    c_arr = (ctypes.c_uint64 * len(consts))(*consts)
    m_flat = [v for row in mds for v in row]
    m_arr = (ctypes.c_uint64 * len(m_flat))(*m_flat)
    lib.poseidon_init(c_arr, m_arr, pc.FULL_ROUNDS, pc.PARTIAL_ROUNDS)
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def keccak256(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from ..ops.keccak import keccak256 as py_keccak256
        return py_keccak256(data)
    out = (ctypes.c_uint8 * 32)()
    lib.keccak256(data, len(data), out)
    return bytes(out)


def poseidon_permute(state12):
    """12 ints -> 12 ints (native if available, else host-exact python)."""
    lib = _load()
    if lib is None:
        from ..ops.merkle import _host_permute
        return _host_permute(list(state12))
    buf = (ctypes.c_uint64 * 12)(*[int(v) for v in state12])
    assert lib.poseidon_permute(buf) == 0
    return list(buf)


def poseidon_permute_batch(states: np.ndarray) -> np.ndarray:
    """(n, 12) uint64 -> (n, 12) uint64."""
    lib = _load()
    states = np.ascontiguousarray(states, dtype=np.uint64)
    if lib is None:
        from ..ops.merkle import _host_permute
        return np.array([_host_permute([int(v) for v in row])
                         for row in states], dtype=np.uint64)
    out = states.copy()
    ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    assert lib.poseidon_permute_batch(ptr, out.shape[0]) == 0
    return out
