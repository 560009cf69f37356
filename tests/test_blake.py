"""Blake2b-256 KATs (reference tools/sm/blake/blake_test.cpp:118-124)."""

import hashlib

from xlayer_prover_tpu.ops.blake2b import blake2b_256, blake2b_256_string

# the reference's blakeTestVectors verbatim
VECTORS = [
    ("", "0xe5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8"),
    ("0x30", "0xfd923ca5e7218c4ba3c3801c26a617ecdbfdaebb9c76ce2eca166e7855efbb8"),
    ("0x3030",
     "0xcbc63dc2acb86bd8967453ef98fd4f2be2f26d7337a0937958211c128a18b442"),
    ("0x303030",
     "0x4f3b771750d60ed12c38f5f80683fb53b37e3da02dd7381454add8f1dbd2ee60"),
    ("0x30313233343536373839",
     "0x7b6cb8d374484e221785288b035dc53fc9ddf000607f473fc2a3258d89a70398"),
    ("0x3031323334353637383930313233343536373839303132333435363738393031"
     "323334353637383930313233343536373839303132333435363738393031323334"
     "3536373839303132333435363738393031323334353637383930313233343536373839",
     "0xcd7d6f7e704dc181e217c07f97c61b4240483e30fc5509024f71eb236058e575"),
]


def test_reference_kats():
    for inp, want in VECTORS:
        assert blake2b_256_string(inp) == want, inp


def test_matches_stdlib_oracle():
    for n in (0, 1, 64, 127, 128, 129, 300, 1000):
        data = bytes(range(256))[:1] * 0 + bytes((i * 7 + 3) % 256
                                                 for i in range(n))
        assert blake2b_256(data) == hashlib.blake2b(
            data, digest_size=32).digest(), n
