// Native host-side crypto for the TPU prover's CPU paths.
//
// The reference implements these in C++/asm (src/XKCP/Keccak-more-compact.cpp,
// the goldilocks submodule's PoseidonGoldilocks); here they back the Python
// executor/state layers via ctypes: keccak-256 for EVM hashing in the Main SM
// and Poseidon-Goldilocks for SMT node hashing / transcript squeezes.
// Poseidon round constants + MDS are injected from Python at init so the
// parameter set stays single-sourced (ops/poseidon_constants.py).
//
// Build: tools/build_native.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Keccak-f[1600] + keccak-256
// ---------------------------------------------------------------------------

static const uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int KECCAK_ROT[5][5] = {
    {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14}};

static inline uint64_t rotl64(uint64_t v, int n) {
  return n ? (v << n) | (v >> (64 - n)) : v;
}

void keccak_f1600(uint64_t *a) {  // 25 lanes, index x + 5*y
  for (int ir = 0; ir < 24; ir++) {
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) a[x + 5 * y] ^= d[x];
    uint64_t b[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(a[x + 5 * y],
                                                  KECCAK_ROT[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) &
                                       b[(x + 2) % 5 + 5 * y]);
    a[0] ^= KECCAK_RC[ir];
  }
}

void keccak256(const uint8_t *data, uint64_t len, uint8_t *out32) {
  const uint64_t rate = 136;
  uint64_t lanes[25];
  std::memset(lanes, 0, sizeof(lanes));
  uint64_t off = 0;
  // full blocks
  while (len - off >= rate) {
    for (uint64_t i = 0; i < rate / 8; i++) {
      uint64_t w;
      std::memcpy(&w, data + off + 8 * i, 8);
      lanes[i] ^= w;
    }
    keccak_f1600(lanes);
    off += rate;
  }
  // final padded block
  uint8_t block[136];
  std::memset(block, 0, sizeof(block));
  std::memcpy(block, data + off, len - off);
  block[len - off] ^= 0x01;
  block[rate - 1] ^= 0x80;
  for (uint64_t i = 0; i < rate / 8; i++) {
    uint64_t w;
    std::memcpy(&w, block + 8 * i, 8);
    lanes[i] ^= w;
  }
  keccak_f1600(lanes);
  std::memcpy(out32, lanes, 32);
}

// batch interface: n hashes of equal length
void keccak256_batch(const uint8_t *data, uint64_t each_len, uint64_t n,
                     uint8_t *out) {
  for (uint64_t i = 0; i < n; i++)
    keccak256(data + i * each_len, each_len, out + 32 * i);
}

// ---------------------------------------------------------------------------
// Poseidon over Goldilocks (t = 12, x^7, params injected from Python)
// ---------------------------------------------------------------------------

static const uint64_t GL_P = 0xFFFFFFFF00000001ULL;

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
  uint64_t s = a + b;
  if (s < a || s >= GL_P) s -= GL_P;  // wrap or >= p (p > 2^63: single sub ok)
  return s;
}

static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
  __uint128_t w = ( __uint128_t )a * b;
  uint64_t lo = (uint64_t)w;
  uint64_t hi = (uint64_t)(w >> 64);
  uint64_t hi_hi = hi >> 32;
  uint64_t hi_lo = hi & 0xFFFFFFFFULL;
  uint64_t t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= 0xFFFFFFFFULL;  // wrapping borrow fix
  uint64_t t1 = hi_lo * 0xFFFFFFFFULL;
  uint64_t r = t0 + t1;
  if (r < t0) r += 0xFFFFFFFFULL;       // wrapping carry fix
  if (r >= GL_P) r -= GL_P;
  return r;
}

static uint64_t POSEIDON_C[360];
static uint64_t POSEIDON_M[12][12];
static uint64_t POSEIDON_MT[12][12];  // transposed: MT[j][i] = M[i][j]
// entries small enough for the raw-u128 MDS accumulation (see mds())
static int poseidon_m_small = 0;
static int poseidon_ready = 0;
static int POSEIDON_RF = 8;
static int POSEIDON_RP = 22;

void poseidon_init(const uint64_t *c, const uint64_t *m, int rf, int rp) {
  std::memcpy(POSEIDON_C, c, sizeof(uint64_t) * 12 * (rf + rp));
  poseidon_m_small = 1;
  for (int i = 0; i < 12; i++)
    for (int j = 0; j < 12; j++) {
      POSEIDON_M[i][j] = m[i * 12 + j];
      POSEIDON_MT[j][i] = m[i * 12 + j];
      // split-32 accumulation needs 12 * m * (2^32-1) < 2^64 per lane,
      // i.e. m < 2^60/12; bound at 2^27 with wide margin (real entries <= 41)
      if (POSEIDON_M[i][j] >= (1ULL << 27)) poseidon_m_small = 0;
    }
  POSEIDON_RF = rf;
  POSEIDON_RP = rp;
  poseidon_ready = 1;
}

static inline uint64_t sbox7(uint64_t x) {
  uint64_t x2 = gl_mul(x, x);
  uint64_t x4 = gl_mul(x2, x2);
  return gl_mul(gl_mul(x4, x2), x);
}

// The official Poseidon-GL MDS is circulant with entries <= 41 (6 bits):
// sum_i st[i] * m fits u128 without per-term reduction (12 * 2^70 < 2^74),
// so the inner loop is raw 64x64 multiplies with ONE reduction per output.
static inline uint64_t gl_reduce128(__uint128_t w) {
  uint64_t lo = (uint64_t)w;
  uint64_t hi = (uint64_t)(w >> 64);
  uint64_t hi_hi = hi >> 32;
  uint64_t hi_lo = hi & 0xFFFFFFFFULL;
  uint64_t t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= 0xFFFFFFFFULL;
  uint64_t t1 = hi_lo * 0xFFFFFFFFULL;
  uint64_t r = t0 + t1;
  if (r < t0) r += 0xFFFFFFFFULL;
  if (r >= GL_P) r -= GL_P;
  return r;
}

static void mds(uint64_t *st) {
  uint64_t out[12];
  if (poseidon_m_small) {
    // split-32 accumulation: products m * st_lo32 / m * st_hi32 both fit
    // u64 (12 * 41 * 2^32 < 2^41 headroom each) so the 144-MAC inner loops
    // are plain u64 multiply-adds the compiler vectorizes (AVX2), vs the
    // unvectorizable u128 MAC chain; recombine via 2^32 shift into one
    // 128-bit reduction per output.
    uint64_t lo32[12], hi32[12];
    for (int i = 0; i < 12; i++) {
      lo32[i] = st[i] & 0xFFFFFFFFULL;
      hi32[i] = st[i] >> 32;
    }
    for (int j = 0; j < 12; j++) {
      uint64_t acc_lo = 0, acc_hi = 0;
      const uint64_t *mt = POSEIDON_MT[j];
      for (int i = 0; i < 12; i++) {
        acc_lo += mt[i] * lo32[i];
        acc_hi += mt[i] * hi32[i];
      }
      __uint128_t acc = ( __uint128_t )acc_hi << 32;
      acc += acc_lo;
      out[j] = gl_reduce128(acc);
    }
  } else {
    for (int j = 0; j < 12; j++) {
      uint64_t acc = 0;
      for (int i = 0; i < 12; i++)
        acc = gl_add(acc, gl_mul(st[i], POSEIDON_M[i][j]));
      out[j] = acc;
    }
  }
  std::memcpy(st, out, sizeof(out));
}

int poseidon_permute(uint64_t *st) {  // 12 elements in/out
  if (!poseidon_ready) return -1;
  int r = 0;
  int half = POSEIDON_RF / 2;
  for (int k = 0; k < half; k++, r++) {
    for (int i = 0; i < 12; i++) st[i] = gl_add(st[i], POSEIDON_C[r * 12 + i]);
    for (int i = 0; i < 12; i++) st[i] = sbox7(st[i]);
    mds(st);
  }
  for (int k = 0; k < POSEIDON_RP; k++, r++) {
    for (int i = 0; i < 12; i++) st[i] = gl_add(st[i], POSEIDON_C[r * 12 + i]);
    st[0] = sbox7(st[0]);
    mds(st);
  }
  for (int k = 0; k < half; k++, r++) {
    for (int i = 0; i < 12; i++) st[i] = gl_add(st[i], POSEIDON_C[r * 12 + i]);
    for (int i = 0; i < 12; i++) st[i] = sbox7(st[i]);
    mds(st);
  }
  return 0;
}

int poseidon_permute_batch(uint64_t *st, uint64_t n) {
  if (!poseidon_ready) return -1;
  for (uint64_t k = 0; k < n; k++) poseidon_permute(st + 12 * k);
  return 0;
}

// SMT storage-key derivation (main_executor.cpp:1080-1115 / key_utils):
// cap = Poseidon(C8 || 0^4)[0:4]; key = Poseidon(A0..A5,B0,B1 || cap)[0:4].
// One crossing instead of two permute round-trips; kin0/kin1 are written
// back so callers can record the PoseidonG SM requests.
int poseidon_storage_key(const uint64_t *c8, const uint64_t *a6,
                         const uint64_t *b2, uint64_t *kin0_out12,
                         uint64_t *kin1_out12, uint64_t *key4) {
  if (!poseidon_ready) return -1;
  uint64_t st[12];
  for (int i = 0; i < 8; i++) st[i] = c8[i];
  for (int i = 8; i < 12; i++) st[i] = 0;
  for (int i = 0; i < 12; i++) kin0_out12[i] = st[i];
  poseidon_permute(st);
  uint64_t st2[12];
  for (int i = 0; i < 6; i++) st2[i] = a6[i];
  st2[6] = b2[0];
  st2[7] = b2[1];
  for (int i = 0; i < 4; i++) st2[8 + i] = st[i];
  for (int i = 0; i < 12; i++) kin1_out12[i] = st2[i];
  poseidon_permute(st2);
  for (int i = 0; i < 4; i++) key4[i] = st2[i];
  return 0;
}

// Poseidon linear hash of a byte stream: append 0x01, zero-pad to 56*N
// bytes, OR 0x80 into the last byte, pack 7 bytes/element little-endian,
// absorb 8-element chunks with the previous digest as capacity (the
// reference's poseidonLinearHash, utils.cpp:677-712 — hashP digests and
// contract bytecode hashes).  One ctypes crossing per digest instead of
// one per 56-byte chunk.
int poseidon_linear_hash_bytes(const uint8_t *data, uint64_t len,
                               uint64_t *out4) {
  if (!poseidon_ready) return -1;
  uint64_t padded_len = ((len + 1 + 55) / 56) * 56;
  uint64_t n_elems = padded_len / 7;
  uint64_t digest[4] = {0, 0, 0, 0};
  uint64_t st[12];
  for (uint64_t start = 0; start < n_elems; start += 8) {
    for (int k = 0; k < 8; k++) {
      uint64_t e = 0;
      uint64_t base = (start + k) * 7;
      for (int b = 0; b < 7; b++) {
        uint64_t pos = base + b;
        uint8_t byte = pos < len ? data[pos] : (pos == len ? 0x01 : 0x00);
        if (pos == padded_len - 1) byte |= 0x80;
        e |= (uint64_t)byte << (8 * b);
      }
      st[k] = e;
    }
    for (int k = 0; k < 4; k++) st[8 + k] = digest[k];
    poseidon_permute(st);
    for (int k = 0; k < 4; k++) digest[k] = st[k];
  }
  for (int k = 0; k < 4; k++) out4[k] = digest[k];
  return 0;
}

// ---------------------------------------------------------------------------
// Batched Goldilocks array arithmetic (fields/glh.py native backend)
//
// The eager CPU proof path evaluates constraint DAGs op-by-op over
// n-element numpy arrays; each glh op costs ~10 numpy dispatches plus
// temporaries (~0.6 ms per 2^14-row mul — dominated by interpreter
// overhead, not ALU).  One ctypes crossing per whole-array op in C with
// __uint128 multiplies runs at memory speed.  The reduction is the same
// branchless split-32 algorithm as glh._mul_wide/_reduce128, so results
// are bit-identical (canonical representatives < p).
// Reference counterpart: the goldilocks submodule's AVX array ops used by
// src/polinomial/polinomial.hpp.
// ---------------------------------------------------------------------------

// gl_add / gl_mul (canonical inputs < p) are defined above for Poseidon;
// sub is the only extra primitive needed.
static inline uint64_t gl_sub1(uint64_t a, uint64_t b) {
  uint64_t d = a - b;
  if (a < b) d -= 0xFFFFFFFFULL;        // wrapping borrow fix
  if (d >= GL_P) d -= GL_P;
  return d;
}
static inline uint64_t gl_add1(uint64_t a, uint64_t b) { return gl_add(a, b); }
static inline uint64_t gl_mul1(uint64_t a, uint64_t b) { return gl_mul(a, b); }

void gl_arr_add(const uint64_t *a, const uint64_t *b, uint64_t *out,
                uint64_t n) {
  for (uint64_t i = 0; i < n; i++) out[i] = gl_add1(a[i], b[i]);
}

void gl_arr_sub(const uint64_t *a, const uint64_t *b, uint64_t *out,
                uint64_t n) {
  for (uint64_t i = 0; i < n; i++) out[i] = gl_sub1(a[i], b[i]);
}

void gl_arr_mul(const uint64_t *a, const uint64_t *b, uint64_t *out,
                uint64_t n) {
  for (uint64_t i = 0; i < n; i++) out[i] = gl_mul1(a[i], b[i]);
}

void gl_arr_mul_scalar(const uint64_t *a, uint64_t b, uint64_t *out,
                       uint64_t n) {
  for (uint64_t i = 0; i < n; i++) out[i] = gl_mul1(a[i], b);
}

void gl_arr_add_scalar(const uint64_t *a, uint64_t b, uint64_t *out,
                       uint64_t n) {
  for (uint64_t i = 0; i < n; i++) out[i] = gl_add1(a[i], b);
}

// Fused cubic-extension multiply in F_p[x]/(x^3 - x - 1): 15 base muls +
// 13 adds per element in one pass (vs 28 whole-array numpy dispatches).
void gl_arr_mul3(const uint64_t *a0, const uint64_t *a1, const uint64_t *a2,
                 const uint64_t *b0, const uint64_t *b1, const uint64_t *b2,
                 uint64_t *o0, uint64_t *o1, uint64_t *o2, uint64_t n) {
  for (uint64_t i = 0; i < n; i++) {
    uint64_t d0 = gl_mul1(a0[i], b0[i]);
    uint64_t d1 = gl_add1(gl_mul1(a0[i], b1[i]), gl_mul1(a1[i], b0[i]));
    uint64_t d2 = gl_add1(gl_add1(gl_mul1(a0[i], b2[i]),
                                  gl_mul1(a1[i], b1[i])),
                          gl_mul1(a2[i], b0[i]));
    uint64_t d3 = gl_add1(gl_mul1(a1[i], b2[i]), gl_mul1(a2[i], b1[i]));
    uint64_t d4 = gl_mul1(a2[i], b2[i]);
    o0[i] = gl_add1(d0, d3);
    o1[i] = gl_add1(d1, gl_add1(d3, d4));
    o2[i] = gl_add1(d2, d4);
  }
}

static inline uint64_t gl_pow1(uint64_t a, uint64_t e) {
  uint64_t result = 1, base = a;
  while (e) {
    if (e & 1) result = gl_mul1(result, base);
    base = gl_mul1(base, base);
    e >>= 1;
  }
  return result;
}

// Batch inversion (Montgomery trick): 3 muls/element + ONE scalar
// exponentiation, vs ~96 whole-array muls for the square-and-multiply
// chain glh.inv runs per call.  Zeros map to zero (0^(p-2) = 0), matching
// glh.inv elementwise.  `scratch` is caller-provided, n elements.
void gl_arr_inv(const uint64_t *a, uint64_t *out, uint64_t *scratch,
                uint64_t n) {
  uint64_t acc = 1;
  for (uint64_t i = 0; i < n; i++) {
    scratch[i] = acc;                       // prefix product BEFORE a[i]
    if (a[i] != 0) acc = gl_mul1(acc, a[i]);
  }
  uint64_t inv_acc = gl_pow1(acc, GL_P - 2);
  for (uint64_t i = n; i-- > 0;) {
    if (a[i] == 0) { out[i] = 0; continue; }
    out[i] = gl_mul1(inv_acc, scratch[i]);
    inv_acc = gl_mul1(inv_acc, a[i]);
  }
}

}  // extern "C"
