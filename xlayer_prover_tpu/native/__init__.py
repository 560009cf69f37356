"""ctypes bindings for the native host crypto library (libzkcrypto.so).

The library is optional: every entry point has a pure-python fallback, so
the framework runs without a compiled artifact (build with
tools/build_native.sh).  Poseidon parameters are injected at load from
ops/poseidon_constants.py so native and python paths share one source.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libzkcrypto.so")
_lib = None

_build_attempted = False


def ensure_built(path: str) -> None:
    """Build the native libs once on demand: *.so is gitignored, so a
    fresh checkout has none (r4's suite failed 4 parity tests for it)."""
    global _build_attempted
    if os.path.exists(path) or _build_attempted:
        return
    _build_attempted = True
    import subprocess
    script = os.path.join(os.path.dirname(__file__), "..", "..",
                          "tools", "build_native.sh")
    if os.path.exists(script):
        try:
            subprocess.run(["bash", script], capture_output=True,
                           timeout=300)
        except Exception:  # noqa: BLE001
            pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    ensure_built(_LIB_PATH)
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
    lib.poseidon_linear_hash_bytes.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)]
    lib.poseidon_linear_hash_bytes.restype = ctypes.c_int
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.poseidon_storage_key.argtypes = [u64p, u64p, u64p, u64p, u64p, u64p]
    lib.poseidon_storage_key.restype = ctypes.c_int

    # Batched Goldilocks array ops (present in rebuilt libs only; an old
    # .so without them just disables the glh native fast path)
    if hasattr(lib, "gl_arr_mul"):
        for name in ("gl_arr_add", "gl_arr_sub", "gl_arr_mul"):
            getattr(lib, name).argtypes = [u64p, u64p, u64p, ctypes.c_uint64]
        for name in ("gl_arr_mul_scalar", "gl_arr_add_scalar"):
            getattr(lib, name).argtypes = [u64p, ctypes.c_uint64, u64p,
                                           ctypes.c_uint64]
        lib.gl_arr_mul3.argtypes = [u64p] * 9 + [ctypes.c_uint64]
        lib.gl_arr_inv.argtypes = [u64p, u64p, u64p, ctypes.c_uint64]

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


def gl_native():
    """The lib handle iff the batched Goldilocks array ops are present."""
    lib = _load()
    if lib is None or not hasattr(lib, "gl_arr_mul"):
        return None
    return lib


def keccak256(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from ..ops.keccak import keccak256 as py_keccak256
        return py_keccak256(data)
    out = (ctypes.c_uint8 * 32)()
    lib.keccak256(data, len(data), out)
    return bytes(out)


# scratch ctypes buffers are thread-local: the executor gRPC server runs
# with max_workers=8, so concurrent batches must not share scratch space
_TLS = threading.local()


def _tls_bufs():
    bufs = getattr(_TLS, "bufs", None)
    if bufs is None:
        bufs = _TLS.bufs = {
            "perm": (ctypes.c_uint64 * 12)(),
            "lh": (ctypes.c_uint64 * 4)(),
            "sk": tuple((ctypes.c_uint64 * n)() for n in (8, 6, 2, 12, 12, 4)),
        }
    return bufs


def poseidon_permute(state12):
    """12 ints -> 12 ints (native if available, else host-exact python)."""
    lib = _load()
    if lib is None:
        from ..ops.merkle import _host_permute
        return _host_permute(list(state12))
    buf = _tls_bufs()["perm"]
    buf[:] = [int(v) for v in state12]
    assert lib.poseidon_permute(buf) == 0
    return list(buf)


def poseidon_storage_key(c8, a6, b2):
    """SMT storage key from registers (cap = H(C||0), key = H(A,B||cap)):
    returns (kin0[12], kin1[12], key4).  One native call; python fallback
    chains two permutes."""
    lib = _load()
    if lib is None:
        kin0 = [int(v) for v in c8] + [0, 0, 0, 0]
        cap = poseidon_permute(kin0)[:4]
        kin1 = [int(v) for v in a6] + [int(b2[0]), int(b2[1])] + cap
        return kin0, kin1, tuple(poseidon_permute(kin1)[:4])
    bc, ba, bb, bk0, bk1, bkey = _tls_bufs()["sk"]
    bc[:] = [int(v) for v in c8]
    ba[:] = [int(v) for v in a6]
    bb[:] = [int(v) for v in b2]
    assert lib.poseidon_storage_key(bc, ba, bb, bk0, bk1, bkey) == 0
    return list(bk0), list(bk1), (int(bkey[0]), int(bkey[1]),
                                  int(bkey[2]), int(bkey[3]))


def poseidon_linear_hash_bytes(data: bytes):
    """Reference poseidonLinearHash over a byte stream -> 4 GL elements
    (native one-call path; python fallback chunks through the permute)."""
    lib = _load()
    if lib is not None:
        buf = _tls_bufs()["lh"]
        assert lib.poseidon_linear_hash_bytes(data, len(data), buf) == 0
        return (int(buf[0]), int(buf[1]), int(buf[2]), int(buf[3]))
    padded = bytearray(data)
    padded.append(0x01)
    while len(padded) % 56 != 0:
        padded.append(0)
    padded[-1] |= 0x80
    elements = [int.from_bytes(padded[i:i + 7], "little")
                for i in range(0, len(padded), 7)]
    digest = [0, 0, 0, 0]
    for start in range(0, len(elements), 8):
        digest = poseidon_permute(elements[start:start + 8] + digest)[:4]
    return tuple(digest)


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


# ---------------------------------------------------------------------------
# BN254 MSM library (libmsm.so): Pippenger G1/G2 + fixed-base batches
# ---------------------------------------------------------------------------

_MSM_PATH = os.path.join(os.path.dirname(__file__), "libmsm.so")
_msm_lib = None
_M64 = (1 << 64) - 1
_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def _load_msm():
    global _msm_lib
    if _msm_lib is not None:
        return _msm_lib
    ensure_built(_MSM_PATH)
    if not os.path.exists(_MSM_PATH):
        return None
    lib = ctypes.CDLL(_MSM_PATH)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    for name in ("msm_g1", "msm_g2", "fixed_base_g1", "fixed_base_g2"):
        fn = getattr(lib, name)
        fn.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
        fn.restype = None
    _msm_lib = lib
    return lib


def msm_available() -> bool:
    return _load_msm() is not None


def _limbs_np(values, width):
    arr = np.zeros((len(values), width), dtype=np.uint64)
    for i, v in enumerate(values):
        for k in range(width):
            arr[i, k] = (v >> (64 * k)) & _M64
    return arr


def _from_limbs(arr, off):
    return int(arr[off]) | (int(arr[off + 1]) << 64) \
        | (int(arr[off + 2]) << 128) | (int(arr[off + 3]) << 192)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def msm_g1(points_affine, scalars):
    """Native Pippenger over G1; points: [(x, y) | None].  Returns a
    Jacobian triple, or None when the library is absent."""
    lib = _load_msm()
    if lib is None:
        return None
    n = len(points_affine)
    xs = [0 if p is None else p[0] for p in points_affine]
    ys = [0 if p is None else p[1] for p in points_affine]
    xy = np.zeros((n, 8), dtype=np.uint64)
    xy[:, :4] = _limbs_np(xs, 4)
    xy[:, 4:] = _limbs_np(ys, 4)
    sc = _limbs_np([s % _FR for s in scalars], 4)
    out = np.zeros(12, dtype=np.uint64)
    lib.msm_g1(_ptr(xy), _ptr(sc), n, _ptr(out))
    return (_from_limbs(out, 0), _from_limbs(out, 4), _from_limbs(out, 8))


def msm_g2(points_affine, scalars):
    """Native Pippenger over G2; points: [((x0,x1),(y0,y1)) | None].
    Returns Jacobian ((x0,x1),(y0,y1),(z0,z1)) or None."""
    lib = _load_msm()
    if lib is None:
        return None
    n = len(points_affine)
    xy = np.zeros((n, 16), dtype=np.uint64)
    for i, p in enumerate(points_affine):
        if p is None:
            continue
        (x0, x1), (y0, y1) = p
        for k, v in enumerate((x0, x1, y0, y1)):
            for m in range(4):
                xy[i, k * 4 + m] = (v >> (64 * m)) & _M64
    sc = _limbs_np([s % _FR for s in scalars], 4)
    out = np.zeros(24, dtype=np.uint64)
    lib.msm_g2(_ptr(xy), _ptr(sc), n, _ptr(out))
    return ((_from_limbs(out, 0), _from_limbs(out, 4)),
            (_from_limbs(out, 8), _from_limbs(out, 12)),
            (_from_limbs(out, 16), _from_limbs(out, 20)))


def fixed_base_g1(gen_affine, scalars):
    """[(k_i * G) affine | None] for a batch of scalars; None if absent."""
    lib = _load_msm()
    if lib is None:
        return None
    n = len(scalars)
    gen = np.zeros(8, dtype=np.uint64)
    for k in range(4):
        gen[k] = (gen_affine[0] >> (64 * k)) & _M64
        gen[4 + k] = (gen_affine[1] >> (64 * k)) & _M64
    sc = _limbs_np([s % _FR for s in scalars], 4)
    out = np.zeros((n, 8), dtype=np.uint64)
    lib.fixed_base_g1(_ptr(gen), _ptr(sc), n, _ptr(out))
    res = []
    for i in range(n):
        x = _from_limbs(out[i], 0)
        y = _from_limbs(out[i], 4)
        res.append(None if x == 0 and y == 0 else (x, y))
    return res


def fixed_base_g2(gen_affine, scalars):
    lib = _load_msm()
    if lib is None:
        return None
    n = len(scalars)
    gen = np.zeros(16, dtype=np.uint64)
    (x0, x1), (y0, y1) = gen_affine
    for k, v in enumerate((x0, x1, y0, y1)):
        for m in range(4):
            gen[k * 4 + m] = (v >> (64 * m)) & _M64
    sc = _limbs_np([s % _FR for s in scalars], 4)
    out = np.zeros((n, 16), dtype=np.uint64)
    lib.fixed_base_g2(_ptr(gen), _ptr(sc), n, _ptr(out))
    res = []
    for i in range(n):
        vals = [_from_limbs(out[i], 4 * k) for k in range(4)]
        if all(v == 0 for v in vals):
            res.append(None)
        else:
            res.append(((vals[0], vals[1]), (vals[2], vals[3])))
    return res
