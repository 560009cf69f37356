"""Cubic extension field vs exact Python-int oracle (poly mod x^3 - x - 1)."""

import numpy as np

from xlayer_prover_tpu.fields import gl, gl3

P = gl.P


def host_mul3(a, b):
    d = [0] * 5
    for i in range(3):
        for j in range(3):
            d[i + j] = (d[i + j] + a[i] * b[j]) % P
    return [(d[0] + d[3]) % P, (d[1] + d[3] + d[4]) % P, (d[2] + d[4]) % P]


def rand3(rng, n):
    return rng.integers(0, P, size=(n, 3), dtype=np.uint64)


def test_mul(rng):
    n = 512
    av, bv = rand3(rng, n), rand3(rng, n)
    a, b = gl3.from_u64_np(av), gl3.from_u64_np(bv)
    got = gl3.to_u64_np(gl3.mul(a, b))
    exp = np.array([host_mul3([int(x) for x in av[i]], [int(y) for y in bv[i]])
                    for i in range(n)], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_inv(rng):
    n = 128
    av = rand3(rng, n)
    av[0] = [5, 0, 0]     # base-field element
    av[1] = [0, 1, 0]     # x
    a = gl3.from_u64_np(av)
    got = gl3.to_u64_np(gl3.inv(a))
    # verify a * inv(a) == 1 by host multiplication
    for i in range(n):
        prod = host_mul3([int(x) for x in av[i]], [int(y) for y in got[i]])
        assert prod == [1, 0, 0], i


def test_batch_inv(rng):
    n = 256
    av = rand3(rng, n)
    av[7] = [0, 0, 0]  # zero maps to zero
    a = gl3.from_u64_np(av)
    got = gl3.to_u64_np(gl3.batch_inv(a))
    assert list(got[7]) == [0, 0, 0]
    for i in range(0, n, 17):
        if i == 7:
            continue
        prod = host_mul3([int(x) for x in av[i]], [int(y) for y in got[i]])
        assert prod == [1, 0, 0], i


def test_frobenius_consistency(rng):
    # a^p computed via linear map == a^p computed via exp chain
    av = rand3(rng, 4)
    a = gl3.from_u64_np(av)
    got = gl3.to_u64_np(gl3.frobenius(a))
    exp = gl3.to_u64_np(gl3.exp_const(a, P))
    assert np.array_equal(got, exp)


def test_irreducibility_sanity():
    # x^3 - x - 1 has no roots in F_p  => irreducible for a cubic
    # (checked via gcd(x^p - x, m) having degree 0 is heavy; instead verify
    # the multiplicative order of x divides p^3-1 but not p-1)
    xv = gl3.from_u64_np(np.array([[0, 1, 0]], dtype=np.uint64))
    r = gl3.to_u64_np(gl3.exp_const(xv, P - 1))[0]
    assert not (r[0] == 1 and r[1] == 0 and r[2] == 0)
    r = gl3.to_u64_np(gl3.exp_const(xv, P ** 3 - 1))[0]
    assert (r[0] == 1 and r[1] == 0 and r[2] == 0)
