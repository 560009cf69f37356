"""Native batched Goldilocks backend (gl_arr_*) vs pure-numpy glh.

The host proof path routes whole-array field ops through libzkcrypto
when operands are large contiguous uint64 arrays (fields/glh.py _nat).
Results must be bit-identical to the numpy twins — same branchless
split-32 reduction (reference: the goldilocks submodule's AVX ops behind
src/polinomial/polinomial.hpp).
"""

import numpy as np
import pytest

from xlayer_prover_tpu.fields import glh


@pytest.fixture(scope="module")
def arrs():
    rng = np.random.default_rng(1234)
    n = 4096  # >= glh._NATIVE_MIN so the native path engages
    a = rng.integers(0, glh.P, size=n, dtype=np.uint64)
    b = rng.integers(0, glh.P, size=n, dtype=np.uint64)
    a[:3] = [0, 1, glh.P - 1]
    b[:3] = [glh.P - 1, 0, glh.P - 1]
    return a, b


def _numpy_ref(fn, *args):
    old = glh._NATIVE
    glh._NATIVE = False
    try:
        return fn(*args)
    finally:
        glh._NATIVE = old


@pytest.fixture(scope="module")
def native():
    lib = glh._nat()
    if lib is None:
        pytest.skip("libzkcrypto gl_arr_* not available")
    return lib


def test_add_sub_mul(native, arrs):
    a, b = arrs
    for fn in (glh.add, glh.sub, glh.mul):
        assert np.array_equal(fn(a, b), _numpy_ref(fn, a, b))


def test_mul_scalar(native, arrs):
    a, _ = arrs
    s = np.uint64(987654321987654321)
    assert np.array_equal(glh.mul(a, s), _numpy_ref(glh.mul, a, s))
    assert np.array_equal(glh.mul_const(a, glh.P + 5),
                          _numpy_ref(glh.mul_const, a, glh.P + 5))


def test_mul3(native, arrs):
    a, b = arrs
    ta = (a, b, glh.add(a, b))
    tb = (b, a, glh.mul(a, b))
    nat = glh.mul3(ta, tb)
    ref = _numpy_ref(glh.mul3, ta, tb)
    for x, y in zip(nat, ref):
        assert np.array_equal(x, y)


def test_inv_montgomery(native, arrs):
    a, _ = arrs
    out = glh.inv(a)
    # zeros map to zero (0^(p-2)); nonzero entries are true inverses
    nz = a != 0
    prod = glh.mul(out[nz], a[nz])
    assert np.all(prod == 1)
    assert np.all(out[~nz] == 0)
    assert np.array_equal(out, _numpy_ref(glh.inv, a))


def test_inv_with_zeros(native):
    z = np.zeros(4096, dtype=np.uint64)
    z[7] = 7
    out = glh.inv(z)
    assert out[0] == 0
    assert (int(out[7]) * 7) % glh.P == 1


def test_small_arrays_fall_back(arrs):
    """Below the threshold the numpy twins run — same results."""
    a, b = arrs
    sa, sb = a[:32].copy(), b[:32].copy()
    assert np.array_equal(glh.mul(sa, sb), _numpy_ref(glh.mul, sa, sb))
    assert np.array_equal(glh.add(sa, sb), _numpy_ref(glh.add, sa, sb))


def test_noncontiguous_falls_back(native, arrs):
    a, b = arrs
    av, bv = a[::2], b[::2]  # strided views: native path must decline
    assert np.array_equal(glh.mul(av, bv), _numpy_ref(glh.mul, av, bv))
