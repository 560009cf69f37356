// Native Poseidon over BN254-Fr (the recursiveF/final commitment hash).
//
// The reference's poseidon_opt runs this in C++ with mpz-free field
// arithmetic; here a generic 4x64 CIOS Montgomery core (modulus params
// injected at init) executes the compressed (P-matrix + sparse S-vector)
// round form used by ops/poseidon_bn254.py — Python passes the round
// constants pre-converted to Montgomery form once per width t, and every
// permute() call drops into this core (the BN128 Merkle trees over 2^20
// leaves go from hours of Python ints to minutes).

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

typedef unsigned __int128 u128;

static uint64_t PMOD[4];
static uint64_t R2[4];
static uint64_t N0INV;

static inline int geq(const uint64_t* a, const uint64_t* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static inline void sub_p(uint64_t* a) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - PMOD[i] - (uint64_t)borrow;
        a[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void add_mod(const uint64_t* a, const uint64_t* b,
                           uint64_t* r) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + (uint64_t)carry;
        r[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || geq(r, PMOD)) sub_p(r);
}

// CIOS Montgomery multiplication, 4x64
static void mont_mul(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a[j] * b[i] + t[j] + (uint64_t)carry;
            t[j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        u128 s = (u128)t[4] + (uint64_t)carry;
        t[4] = (uint64_t)s;
        t[5] = (uint64_t)(s >> 64);
        uint64_t m = t[0] * N0INV;
        carry = ((u128)m * PMOD[0] + t[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 cur = (u128)m * PMOD[j] + t[j] + (uint64_t)carry;
            t[j - 1] = (uint64_t)cur;
            carry = cur >> 64;
        }
        s = (u128)t[4] + (uint64_t)carry;
        t[3] = (uint64_t)s;
        t[4] = t[5] + (uint64_t)(s >> 64);
    }
    if (t[4] || geq(t, PMOD)) sub_p(t);
    memcpy(r, t, 32);
}

static inline void pow5(const uint64_t* x, uint64_t* r) {
    uint64_t x2[4], x4[4];
    mont_mul(x, x, x2);
    mont_mul(x2, x2, x4);
    mont_mul(x4, x, r);
}

// per-width parameter tables (Montgomery-form limbs, layout mirrors
// ops/poseidon_bn254.py: c flat, m row-major t*t, p row-major t*t,
// s flat (2t-1)*nrp)
struct Params {
    int t;
    int nrp;
    uint64_t* c;
    uint64_t* m;
    uint64_t* p;
    uint64_t* s;
};
static Params PARAMS[18];

void posbn_init(const uint64_t* p_limbs, const uint64_t* r2_limbs,
                uint64_t n0inv) {
    memcpy(PMOD, p_limbs, 32);
    memcpy(R2, r2_limbs, 32);
    N0INV = n0inv;
}

void posbn_set_params(int t, int nrp, const uint64_t* c, uint64_t nc,
                      const uint64_t* m, const uint64_t* p,
                      const uint64_t* s, uint64_t ns) {
    Params* pr = &PARAMS[t];
    pr->t = t;
    pr->nrp = nrp;
    free(pr->c); free(pr->m); free(pr->p); free(pr->s);
    pr->c = (uint64_t*)malloc(nc * 32);
    memcpy(pr->c, c, nc * 32);
    pr->m = (uint64_t*)malloc((size_t)t * t * 32);
    memcpy(pr->m, m, (size_t)t * t * 32);
    pr->p = (uint64_t*)malloc((size_t)t * t * 32);
    memcpy(pr->p, p, (size_t)t * t * 32);
    pr->s = (uint64_t*)malloc(ns * 32);
    memcpy(pr->s, s, ns * 32);
}

int posbn_has_params(int t) {
    return t >= 2 && t <= 17 && PARAMS[t].c != 0;
}

#define NF 8
#define MAXT 17

static inline void mat_mul(const uint64_t* mat, const uint64_t* st,
                           uint64_t* out, int t) {
    // out[i] = sum_j mat[j][i] * st[j]  (column-major access like the
    // Python mix(): mat[j*t + i])
    for (int i = 0; i < t; i++) {
        uint64_t acc[4] = {0, 0, 0, 0};
        uint64_t prod[4];
        for (int j = 0; j < t; j++) {
            mont_mul(&mat[((size_t)j * t + i) * 4], &st[j * 4], prod);
            add_mod(acc, prod, acc);
        }
        memcpy(&out[i * 4], acc, 32);
    }
}

// io: t x 4 limbs, raw (non-Montgomery) form in/out
int posbn_permute(int t, uint64_t* io) {
    if (!posbn_has_params(t)) return -1;
    const Params* pr = &PARAMS[t];
    int nrp = pr->nrp;
    const uint64_t* c = pr->c;
    uint64_t st[MAXT * 4], tmp[MAXT * 4];

    for (int i = 0; i < t; i++)                    // to Montgomery
        mont_mul(&io[i * 4], R2, &st[i * 4]);

    for (int i = 0; i < t; i++)
        add_mod(&st[i * 4], &c[i * 4], &st[i * 4]);

    for (int r = 0; r < NF / 2 - 1; r++) {
        for (int i = 0; i < t; i++) {
            pow5(&st[i * 4], &st[i * 4]);
            add_mod(&st[i * 4], &c[((size_t)(r + 1) * t + i) * 4],
                    &st[i * 4]);
        }
        mat_mul(pr->m, st, tmp, t);
        memcpy(st, tmp, (size_t)t * 32);
    }
    for (int i = 0; i < t; i++) {
        pow5(&st[i * 4], &st[i * 4]);
        add_mod(&st[i * 4], &c[((size_t)(NF / 2) * t + i) * 4], &st[i * 4]);
    }
    mat_mul(pr->p, st, tmp, t);
    memcpy(st, tmp, (size_t)t * 32);

    for (int r = 0; r < nrp; r++) {
        pow5(&st[0], &st[0]);
        add_mod(&st[0], &c[((size_t)(NF / 2 + 1) * t + r) * 4], &st[0]);
        uint64_t s0[4] = {0, 0, 0, 0}, prod[4];
        const uint64_t* srow = &pr->s[((size_t)(t * 2 - 1) * r) * 4];
        for (int j = 0; j < t; j++) {
            mont_mul(&srow[j * 4], &st[j * 4], prod);
            add_mod(s0, prod, s0);
        }
        for (int j = 1; j < t; j++) {
            mont_mul(&st[0], &srow[(t + j - 1) * 4], prod);
            add_mod(&st[j * 4], prod, &st[j * 4]);
        }
        memcpy(&st[0], s0, 32);
    }

    for (int r = 0; r < NF / 2 - 1; r++) {
        for (int i = 0; i < t; i++) {
            pow5(&st[i * 4], &st[i * 4]);
            add_mod(&st[i * 4],
                    &c[((size_t)(NF / 2 + 1) * t + nrp
                        + (size_t)r * t + i) * 4],
                    &st[i * 4]);
        }
        mat_mul(pr->m, st, tmp, t);
        memcpy(st, tmp, (size_t)t * 32);
    }
    for (int i = 0; i < t; i++)
        pow5(&st[i * 4], &st[i * 4]);
    mat_mul(pr->m, st, tmp, t);

    uint64_t one[4] = {1, 0, 0, 0};
    for (int i = 0; i < t; i++)                    // from Montgomery
        mont_mul(&tmp[i * 4], one, &io[i * 4]);
    return 0;
}

// batch API: n independent permutations of width t (thread-parallel —
// the tree levels this serves are embarrassingly parallel)
int posbn_permute_batch(int t, uint64_t n, uint64_t* io) {
    if (!posbn_has_params(t)) return -1;
    int bad = 0;
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < (int64_t)n; k++) {
        if (posbn_permute(t, io + (size_t)k * t * 4)) bad = 1;
    }
    return bad ? -1 : 0;
}

}  // extern "C"

extern "C" {
// debug probes
uint64_t posbn_probe_pmod0(void) { return PMOD[0]; }
uint64_t posbn_probe_r20(void) { return R2[0]; }
uint64_t posbn_probe_c0(int t) {
    return posbn_has_params(t) ? PARAMS[t].c[0] : 0;
}
void posbn_probe_mul(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    mont_mul(a, b, r);
}
}
