"""NTT/INTT/LDE vs exact host oracle."""

import numpy as np

from xlayer_prover_tpu.fields import gl
from xlayer_prover_tpu.ops import ntt

P = gl.P


def naive_ntt(vals, w):
    n = len(vals)
    return [sum(int(vals[j]) * pow(w, i * j, P) for j in range(n)) % P
            for i in range(n)]


def test_ntt_small_vs_naive(rng):
    nbits = 4
    n = 1 << nbits
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    a = gl.from_u64_np(vals)
    got = gl.to_u64_np(ntt.ntt(a))
    exp = np.array(naive_ntt(vals, gl.host_w(nbits)), dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_intt_roundtrip(rng):
    for nbits in [1, 3, 8, 12]:
        n = 1 << nbits
        vals = rng.integers(0, P, size=(n, 3), dtype=np.uint64)
        a = gl.from_u64_np(vals)
        back = gl.to_u64_np(ntt.intt(ntt.ntt(a)))
        assert np.array_equal(back, vals), nbits


def test_extend_pol_evaluations(rng):
    nbits, nbits_ext = 5, 7
    n = 1 << nbits
    vals = rng.integers(0, P, size=(n, 2), dtype=np.uint64)
    a = gl.from_u64_np(vals)
    ext = gl.to_u64_np(ntt.extend_pol(a, nbits_ext))
    # oracle: interpolate coefficients, eval at shift * w_ext^i
    coeffs = gl.to_u64_np(ntt.intt(a))
    w_ext = gl.host_w(nbits_ext)
    for col in range(2):
        for i in [0, 1, 5, 100, (1 << nbits_ext) - 1]:
            x = (gl.SHIFT * pow(w_ext, i, P)) % P
            exp = ntt.eval_poly_coeffs_at(coeffs[:, col], x)
            assert int(ext[i, col]) == exp, (col, i)


def test_extend_pol_prefix_consistency(rng):
    # LDE of the same poly on two extension sizes agree on matching points:
    # ext7 rows at stride 4 == poly(shift * w_5^i)? No — compare via oracle
    # instead: ext with nbits_ext == nbits equals coset eval of same domain.
    nbits = 4
    n = 1 << nbits
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    a = gl.from_u64_np(vals)
    ext = gl.to_u64_np(ntt.extend_pol(a, nbits))
    coeffs = gl.to_u64_np(ntt.intt(a))
    w = gl.host_w(nbits)
    for i in range(0, n, 3):
        x = (gl.SHIFT * pow(w, i, P)) % P
        assert int(ext[i]) == ntt.eval_poly_coeffs_at(coeffs, x)
