"""Goldilocks field ops vs exact Python-int oracle."""

import numpy as np
import pytest

from xlayer_prover_tpu.fields import gl

P = gl.P


def rand_u64(rng, n, edge=True):
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    if edge and n >= 8:
        # Edge cases: 0, 1, p-1, p-2, 2^32-1, 2^32, 2^63, epsilon-ish
        vals[:8] = np.array([0, 1, P - 1, P - 2, (1 << 32) - 1, 1 << 32,
                             1 << 63, (1 << 64) - (1 << 32)], dtype=np.uint64)
    return vals


def test_roundtrip(rng):
    v = rand_u64(rng, 64)
    a = gl.from_u64_np(v)
    assert np.array_equal(gl.to_u64_np(a), v)


def test_add_sub_neg(rng):
    n = 1024
    av, bv = rand_u64(rng, n), rand_u64(rng, n, edge=False)
    a, b = gl.from_u64_np(av), gl.from_u64_np(bv)
    got = gl.to_u64_np(gl.add(a, b))
    exp = np.array([(int(x) + int(y)) % P for x, y in zip(av, bv)], dtype=np.uint64)
    assert np.array_equal(got, exp)
    got = gl.to_u64_np(gl.sub(a, b))
    exp = np.array([(int(x) - int(y)) % P for x, y in zip(av, bv)], dtype=np.uint64)
    assert np.array_equal(got, exp)
    got = gl.to_u64_np(gl.neg(a))
    exp = np.array([(-int(x)) % P for x in av], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_mul(rng):
    n = 4096
    av, bv = rand_u64(rng, n), rand_u64(rng, n)
    # include worst-case magnitude pairs
    av[8:12] = np.uint64(P - 1)
    bv[8:12] = np.uint64(P - 1)
    a, b = gl.from_u64_np(av), gl.from_u64_np(bv)
    got = gl.to_u64_np(gl.mul(a, b))
    exp = np.array([(int(x) * int(y)) % P for x, y in zip(av, bv)], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_exp_inv(rng):
    n = 256
    av = rand_u64(rng, n)
    a = gl.from_u64_np(av)
    got = gl.to_u64_np(gl.exp_const(a, 12345))
    exp = np.array([pow(int(x), 12345, P) for x in av], dtype=np.uint64)
    assert np.array_equal(got, exp)
    got = gl.to_u64_np(gl.inv(a))
    exp = np.array([0 if int(x) == 0 else pow(int(x), P - 2, P) for x in av],
                   dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_batch_inv(rng):
    n = 1000
    av = rand_u64(rng, n)
    av[5] = 0  # embedded zero must map to zero
    a = gl.from_u64_np(av)
    got = gl.to_u64_np(gl.batch_inv(a))
    exp = np.array([0 if int(x) == 0 else pow(int(x), P - 2, P) for x in av],
                   dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_batch_inv_2d(rng):
    av = rand_u64(rng, 64).reshape(8, 8)
    a = gl.from_u64_np(av)
    got = gl.to_u64_np(gl.batch_inv(a, axis=1))
    exp = np.vectorize(lambda x: 0 if int(x) == 0 else pow(int(x), P - 2, P),
                       otypes=[np.uint64])(av)
    assert np.array_equal(got, exp)


def test_roots_of_unity():
    for k in [1, 2, 10, 23, 32]:
        w = gl.host_w(k)
        assert pow(w, 1 << k, P) == 1
        assert pow(w, 1 << (k - 1), P) != 1


def test_powers():
    pw = gl.to_u64_np(gl.powers(7, 10, start=3))
    exp = np.array([(3 * pow(7, i, P)) % P for i in range(10)], dtype=np.uint64)
    assert np.array_equal(pw, exp)


def test_generator_order():
    # g=7 generates the full multiplicative group: g^((p-1)/q) != 1 for all
    # prime factors q of p-1 = 2^32 * 3 * 5 * 17 * 257 * 65537
    for q in [2, 3, 5, 17, 257, 65537]:
        assert pow(7, (P - 1) // q, P) != 1
