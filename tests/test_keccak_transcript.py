"""Keccak (known-answer vectors) and transcript behavior tests."""

import numpy as np

from xlayer_prover_tpu.ops import keccak
from xlayer_prover_tpu.stark.transcript import Transcript


def test_keccak256_known_vectors():
    assert keccak.keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak.keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    # multi-block (> 136 bytes)
    long = b"a" * 200
    assert len(keccak.keccak256(long)) == 32


def test_keccak_f_device_vs_host(rng):
    batch = 4
    lanes = rng.integers(0, 1 << 64, size=(batch, 25), dtype=np.uint64)
    lo = (lanes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (lanes >> np.uint64(32)).astype(np.uint32)
    out_lo, out_hi = keccak.keccak_f((lo, hi))
    out = np.asarray(out_lo, dtype=np.uint64) | (np.asarray(out_hi, dtype=np.uint64) << np.uint64(32))
    for b in range(batch):
        exp = keccak._host_keccak_f([int(v) for v in lanes[b]])
        assert [int(v) for v in out[b]] == exp, b


def test_keccak_f_zero_state_nonzero():
    lo = np.zeros((1, 25), dtype=np.uint32)
    hi = np.zeros((1, 25), dtype=np.uint32)
    out_lo, out_hi = keccak.keccak_f((lo, hi))
    assert int(np.asarray(out_lo).sum()) != 0


def test_transcript_determinism_and_sensitivity():
    t1, t2 = Transcript(), Transcript()
    t1.put([1, 2, 3])
    t2.put([1, 2, 3])
    assert t1.get_fields1() == t2.get_fields1()
    t3 = Transcript()
    t3.put([1, 2, 4])
    t4 = Transcript()
    t4.put([1, 2, 3])
    assert t3.get_fields1() != t4.get_fields1()


def test_transcript_out_cursor_reset_on_put():
    # drawing, then absorbing, then drawing again re-squeezes
    t = Transcript()
    t.put([5])
    a = t.get_fields1()
    t.put([6])
    b = t.get_fields1()
    assert a != b


def test_transcript_multiblock_absorb():
    # >8 elements forces an intermediate permutation with state chaining
    t = Transcript()
    t.put(list(range(1, 12)))
    v1 = t.get_fields1()
    t2 = Transcript()
    t2.put(list(range(1, 12)))
    assert v1 == t2.get_fields1()


def test_get_permutations_range():
    t = Transcript()
    t.put([42])
    perms = t.get_permutations(16, 10)
    assert len(perms) == 16
    assert all(0 <= p < (1 << 10) for p in perms)
    # deterministic
    t2 = Transcript()
    t2.put([42])
    assert perms == t2.get_permutations(16, 10)
