"""Device h1/h2 multiset split (lax.sort) vs the host numpy reference."""

import numpy as np

from xlayer_prover_tpu.stark import lookup


def _case(rng, n, dim, dup_heavy=False):
    pool = rng.integers(0, 50 if dup_heavy else 1 << 62, size=(n, dim),
                        dtype=np.uint64)
    t = pool
    pick = rng.integers(0, n, size=n)
    f = t[pick]
    return f, t


def test_device_matches_host(rng):
    import jax.numpy as jnp
    for n, dim, dup in ((64, 1, False), (128, 3, False), (256, 3, True)):
        f, t = _case(rng, n, dim, dup)
        h1, h2 = lookup.calculate_h1h2(f.copy(), t.copy())
        d1, d2, bad = lookup.calculate_h1h2_device(jnp.asarray(f),
                                                   jnp.asarray(t))
        assert int(bad) == 0
        assert np.array_equal(np.asarray(d1), h1), (n, dim, dup)
        assert np.array_equal(np.asarray(d2), h2), (n, dim, dup)


def test_device_detects_missing_f(rng):
    import jax.numpy as jnp
    f, t = _case(rng, 64, 3)
    f = f.copy()
    f[17] = [1, 2, 3]          # not present in t (values are >= 0 random)
    while any(np.array_equal(f[17], row) for row in t):
        f[17][0] += 1
    _h1, _h2, bad = lookup.calculate_h1h2_device(jnp.asarray(f),
                                                 jnp.asarray(t))
    assert int(bad) >= 1
