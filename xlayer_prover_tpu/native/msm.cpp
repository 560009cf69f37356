// Native BN254 multi-scalar multiplication (G1 + G2 Pippenger).
//
// TPU-native framework's equivalent of the reference's ffiasm
// MultiExp/PointParallelProcessor (src/ffiasm/multiexp.hpp,
// pointparallelprocessor.hpp; consumed by rapidsnark Groth16,
// src/rapidsnark/groth16.cpp): the Groth16 proving MSMs are host work, so
// they run in native code — 4x64-limb Montgomery Fq, Jacobian points,
// bucketed windows with the running-sum trick, OpenMP-free (the Python
// layer parallelizes across the five independent proof MSMs).
//
// ABI (ctypes):
//   msm_g1(xy[n*8], scalars[n*4], n, out[12])   // limbs little-endian,
//   msm_g2(xy[n*16], scalars[n*4], n, out[24])  // standard (non-Montgomery)
// Points are affine (x, y); a zero (x, y) pair means infinity.  Outputs
// are Jacobian (X, Y, Z), Z=0 for infinity, standard form.

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

struct Fq { u64 l[4]; };

static const Fq Pmod  = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                          0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const Fq R2    = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                          0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};
static const Fq ONE_M = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                          0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};
static const u64 INV = 0x87d20782e4866389ULL;

static inline bool is_zero(const Fq &a) {
    return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}

static inline bool geq_p(const Fq &a) {
    for (int i = 3; i >= 0; i--) {
        if (a.l[i] > Pmod.l[i]) return true;
        if (a.l[i] < Pmod.l[i]) return false;
    }
    return true;  // equal
}

static inline void sub_p(Fq &a) {
    u128 bw = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.l[i] - Pmod.l[i] - bw;
        a.l[i] = (u64)d;
        bw = (d >> 64) & 1;
    }
}

static inline void fq_add(Fq &r, const Fq &a, const Fq &b) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
        c += (u128)a.l[i] + b.l[i];
        r.l[i] = (u64)c;
        c >>= 64;
    }
    if (c || geq_p(r)) sub_p(r);
}

static inline void fq_sub(Fq &r, const Fq &a, const Fq &b) {
    u128 bw = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.l[i] - b.l[i] - bw;
        r.l[i] = (u64)d;
        bw = (d >> 64) & 1;
    }
    if (bw) {  // += P
        u128 c = 0;
        for (int i = 0; i < 4; i++) {
            c += (u128)r.l[i] + Pmod.l[i];
            r.l[i] = (u64)c;
            c >>= 64;
        }
    }
}

// CIOS Montgomery multiplication
static inline void fq_mul(Fq &r, const Fq &a, const Fq &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            c += (u128)t[j] + (u128)a.l[i] * b.l[j];
            t[j] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[4] = (u64)c;
        t[5] = (u64)(c >> 64);
        u64 m = t[0] * INV;
        c = (u128)t[0] + (u128)m * Pmod.l[0];
        c >>= 64;
        for (int j = 1; j < 4; j++) {
            c += (u128)t[j] + (u128)m * Pmod.l[j];
            t[j - 1] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[3] = (u64)c;
        t[4] = t[5] + (u64)(c >> 64);
    }
    for (int i = 0; i < 4; i++) r.l[i] = t[i];
    if (t[4] || geq_p(r)) sub_p(r);
}

static inline void fq_sqr(Fq &r, const Fq &a) { fq_mul(r, a, a); }

static inline void to_mont(Fq &r, const Fq &a) { fq_mul(r, a, R2); }

static inline void from_mont(Fq &r, const Fq &a) {
    Fq one = {{1, 0, 0, 0}};
    fq_mul(r, a, one);
}

static inline void fq_dbl(Fq &r, const Fq &a) { fq_add(r, a, a); }

// ---------------------------------------------------------------------
// Fq2 = Fq[u] / (u^2 + 1)
// ---------------------------------------------------------------------

struct Fq2 { Fq c0, c1; };

static inline bool is_zero2(const Fq2 &a) {
    return is_zero(a.c0) && is_zero(a.c1);
}

static inline void fq2_add(Fq2 &r, const Fq2 &a, const Fq2 &b) {
    fq_add(r.c0, a.c0, b.c0);
    fq_add(r.c1, a.c1, b.c1);
}

static inline void fq2_sub(Fq2 &r, const Fq2 &a, const Fq2 &b) {
    fq_sub(r.c0, a.c0, b.c0);
    fq_sub(r.c1, a.c1, b.c1);
}

static inline void fq2_mul(Fq2 &r, const Fq2 &a, const Fq2 &b) {
    Fq t0, t1, t2, t3;
    fq_mul(t0, a.c0, b.c0);
    fq_mul(t1, a.c1, b.c1);
    fq_add(t2, a.c0, a.c1);
    fq_add(t3, b.c0, b.c1);
    fq_sub(r.c0, t0, t1);
    fq_mul(t2, t2, t3);
    fq_sub(t2, t2, t0);
    fq_sub(r.c1, t2, t1);
}

static inline void fq2_sqr(Fq2 &r, const Fq2 &a) { fq2_mul(r, a, a); }

static inline void fq2_dbl(Fq2 &r, const Fq2 &a) { fq2_add(r, a, a); }

// ---------------------------------------------------------------------
// Jacobian points, templated over the coordinate field
// ---------------------------------------------------------------------

template <typename F>
struct Pt { F x, y, z; bool inf; };

template <typename F, void (*ADD)(F &, const F &, const F &),
          void (*SUB)(F &, const F &, const F &),
          void (*MUL)(F &, const F &, const F &),
          void (*SQR)(F &, const F &), void (*DBL)(F &, const F &),
          bool (*ZERO)(const F &)>
struct Curve {
    static void dbl(Pt<F> &r, const Pt<F> &p) {
        if (p.inf || ZERO(p.y)) { r.inf = true; return; }
        F a, b, c, d, e, f, t, t2, z3;
        MUL(t, p.y, p.z);      // Z3 first: r may alias p
        DBL(z3, t);
        SQR(a, p.x);
        SQR(b, p.y);
        SQR(c, b);
        ADD(t, p.x, b);
        SQR(t, t);
        SUB(t, t, a);
        SUB(t, t, c);
        DBL(d, t);
        DBL(e, a);
        ADD(e, e, a);
        SQR(f, e);
        DBL(t, d);
        SUB(r.x, f, t);
        SUB(t, d, r.x);
        MUL(t, e, t);
        DBL(t2, c);
        DBL(t2, t2);
        DBL(t2, t2);
        SUB(r.y, t, t2);
        r.z = z3;
        r.inf = false;
    }

    static void add(Pt<F> &r, const Pt<F> &p, const Pt<F> &q) {
        if (p.inf) { r = q; return; }
        if (q.inf) { r = p; return; }
        F z1z1, z2z2, u1, u2, s1, s2, t;
        SQR(z1z1, p.z);
        SQR(z2z2, q.z);
        MUL(u1, p.x, z2z2);
        MUL(u2, q.x, z1z1);
        MUL(t, q.z, z2z2);
        MUL(s1, p.y, t);
        MUL(t, p.z, z1z1);
        MUL(s2, q.y, t);
        F h, rr;
        SUB(h, u2, u1);
        SUB(rr, s2, s1);
        if (ZERO(h)) {
            if (ZERO(rr)) { dbl(r, p); return; }
            r.inf = true;
            return;
        }
        F i, j, v, t2;
        DBL(t, h);
        SQR(i, t);
        MUL(j, h, i);
        DBL(rr, rr);
        MUL(v, u1, i);
        SQR(t, rr);
        SUB(t, t, j);
        DBL(t2, v);
        SUB(r.x, t, t2);
        SUB(t, v, r.x);
        MUL(t, rr, t);
        MUL(t2, s1, j);
        DBL(t2, t2);
        SUB(r.y, t, t2);
        ADD(t, p.z, q.z);
        SQR(t, t);
        SUB(t, t, z1z1);
        SUB(t, t, z2z2);
        MUL(r.z, t, h);
        r.inf = false;
    }
};

typedef Curve<Fq, fq_add, fq_sub, fq_mul, fq_sqr, fq_dbl, is_zero> G1;
typedef Curve<Fq2, fq2_add, fq2_sub, fq2_mul, fq2_sqr, fq2_dbl, is_zero2> G2;

// ---------------------------------------------------------------------
// Pippenger
// ---------------------------------------------------------------------

template <typename F, typename C>
static void pippenger(const Pt<F> *pts, const u64 *scalars, u64 n,
                      Pt<F> &out) {
    int c = 16;
    u64 bl = 64 - __builtin_clzll(n | 1);
    if (bl < 16) c = bl < 2 ? 2 : (int)bl;
    int nbits = 254;
    int n_windows = (nbits + c - 1) / c;
    size_t n_buckets = ((size_t)1 << c) - 1;
    std::vector<Pt<F>> buckets(n_buckets);
    out.inf = true;
    for (int w = n_windows - 1; w >= 0; w--) {
        for (int k = 0; k < c; k++) C::dbl(out, out);
        for (size_t b = 0; b < n_buckets; b++) buckets[b].inf = true;
        int shift = w * c;
        for (u64 i = 0; i < n; i++) {
            int limb = shift >> 6;
            int off = shift & 63;
            u64 digit = scalars[i * 4 + limb] >> off;
            if (off + c > 64 && limb < 3)
                digit |= scalars[i * 4 + limb + 1] << (64 - off);
            digit &= (((u64)1 << c) - 1);
            if (digit)
                C::add(buckets[digit - 1], buckets[digit - 1], pts[i]);
        }
        Pt<F> running, window_sum;
        running.inf = true;
        window_sum.inf = true;
        for (size_t b = n_buckets; b-- > 0;) {
            C::add(running, running, buckets[b]);
            C::add(window_sum, window_sum, running);
        }
        C::add(out, out, window_sum);
    }
}

extern "C" {

void msm_g1(const u64 *xy, const u64 *scalars, u64 n, u64 *out) {
    std::vector<Pt<Fq>> pts(n);
    for (u64 i = 0; i < n; i++) {
        Fq x, y;
        std::memcpy(x.l, xy + i * 8, 32);
        std::memcpy(y.l, xy + i * 8 + 4, 32);
        pts[i].inf = is_zero(x) && is_zero(y);
        if (!pts[i].inf) {
            to_mont(pts[i].x, x);
            to_mont(pts[i].y, y);
            pts[i].z = ONE_M;
        }
    }
    Pt<Fq> acc;
    pippenger<Fq, G1>(pts.data(), scalars, n, acc);
    Fq z = {{0, 0, 0, 0}};
    if (acc.inf) {
        std::memset(out, 0, 12 * 8);
        out[4] = 1;  // y = 1, z = 0 (python INF convention (0,1,0))
        return;
    }
    from_mont(z, acc.z);
    Fq x, y;
    from_mont(x, acc.x);
    from_mont(y, acc.y);
    std::memcpy(out, x.l, 32);
    std::memcpy(out + 4, y.l, 32);
    std::memcpy(out + 8, z.l, 32);
}

void msm_g2(const u64 *xy, const u64 *scalars, u64 n, u64 *out) {
    std::vector<Pt<Fq2>> pts(n);
    for (u64 i = 0; i < n; i++) {
        Fq v[4];
        for (int k = 0; k < 4; k++)
            std::memcpy(v[k].l, xy + i * 16 + k * 4, 32);
        bool inf = is_zero(v[0]) && is_zero(v[1]) && is_zero(v[2])
            && is_zero(v[3]);
        pts[i].inf = inf;
        if (!inf) {
            to_mont(pts[i].x.c0, v[0]);
            to_mont(pts[i].x.c1, v[1]);
            to_mont(pts[i].y.c0, v[2]);
            to_mont(pts[i].y.c1, v[3]);
            pts[i].z.c0 = ONE_M;
            std::memset(pts[i].z.c1.l, 0, 32);
        }
    }
    Pt<Fq2> acc;
    pippenger<Fq2, G2>(pts.data(), scalars, n, acc);
    if (acc.inf) {
        std::memset(out, 0, 24 * 8);
        out[8] = 1;  // y.c0 = 1, z = 0
        return;
    }
    Fq t;
    from_mont(t, acc.x.c0); std::memcpy(out, t.l, 32);
    from_mont(t, acc.x.c1); std::memcpy(out + 4, t.l, 32);
    from_mont(t, acc.y.c0); std::memcpy(out + 8, t.l, 32);
    from_mont(t, acc.y.c1); std::memcpy(out + 12, t.l, 32);
    from_mont(t, acc.z.c0); std::memcpy(out + 16, t.l, 32);
    from_mont(t, acc.z.c1); std::memcpy(out + 20, t.l, 32);
}

}  // extern "C"

// ---------------------------------------------------------------------
// Fixed-base batch scalar multiplication (Groth16 setup: tau-power tables)
// ---------------------------------------------------------------------

static void fq_pow(Fq &r, const Fq &a, const Fq &e) {
    Fq base = a;
    r = ONE_M;
    for (int limb = 0; limb < 4; limb++) {
        u64 bits = e.l[limb];
        for (int k = 0; k < 64; k++) {
            if ((bits >> k) & 1) fq_mul(r, r, base);
            fq_sqr(base, base);
        }
    }
}

static void fq_inv_mont(Fq &r, const Fq &a) {
    Fq e = Pmod;
    // e = p - 2
    e.l[0] -= 2;  // p.l[0] >= 2, no borrow
    fq_pow(r, a, e);
}

template <typename F, typename C>
static void fixed_base(const Pt<F> &gen, const u64 *scalars, u64 n,
                       Pt<F> *out) {
    const int c = 8;
    const int n_windows = (254 + c - 1) / c;   // 32
    const size_t tsize = ((size_t)1 << c) - 1;
    std::vector<Pt<F>> table(n_windows * tsize);
    Pt<F> base = gen;
    for (int w = 0; w < n_windows; w++) {
        Pt<F> acc = base;
        for (size_t k = 0; k < tsize; k++) {
            table[w * tsize + k] = acc;
            C::add(acc, acc, base);
        }
        base = acc;  // acc = base * 2^c after tsize+1 additions? no:
        // acc after loop = base*(tsize+1) = base*2^c  (started at base,
        // added base tsize times)
    }
    for (u64 i = 0; i < n; i++) {
        Pt<F> acc;
        acc.inf = true;
        for (int w = 0; w < n_windows; w++) {
            int shift = w * c;
            int limb = shift >> 6;
            int off = shift & 63;
            u64 digit = scalars[i * 4 + limb] >> off;
            if (off + c > 64 && limb < 3)
                digit |= scalars[i * 4 + limb + 1] << (64 - off);
            digit &= (((u64)1 << c) - 1);
            if (digit)
                C::add(acc, acc, table[w * tsize + digit - 1]);
        }
        out[i] = acc;
    }
}

// batch-normalize jacobian -> affine via one inversion (Montgomery trick)
static void g1_normalize(Pt<Fq> *pts, u64 n, u64 *xy_out) {
    std::vector<Fq> prefix(n);
    Fq run = ONE_M;
    for (u64 i = 0; i < n; i++) {
        prefix[i] = run;
        if (!pts[i].inf) fq_mul(run, run, pts[i].z);
    }
    Fq inv_all;
    fq_inv_mont(inv_all, run);
    for (u64 i = n; i-- > 0;) {
        if (pts[i].inf) {
            std::memset(xy_out + i * 8, 0, 64);
            continue;
        }
        Fq zinv, zi2, t;
        fq_mul(zinv, inv_all, prefix[i]);
        fq_mul(inv_all, inv_all, pts[i].z);
        fq_sqr(zi2, zinv);
        Fq x, y;
        fq_mul(x, pts[i].x, zi2);
        fq_mul(t, zi2, zinv);
        fq_mul(y, pts[i].y, t);
        from_mont(x, x);
        from_mont(y, y);
        std::memcpy(xy_out + i * 8, x.l, 32);
        std::memcpy(xy_out + i * 8 + 4, y.l, 32);
    }
}

static void fq2_inv_mont(Fq2 &r, const Fq2 &a) {
    // 1/(c0 + c1 u) = (c0 - c1 u) / (c0^2 + c1^2)
    Fq t0, t1, d;
    fq_sqr(t0, a.c0);
    fq_sqr(t1, a.c1);
    fq_add(d, t0, t1);
    fq_inv_mont(d, d);
    fq_mul(r.c0, a.c0, d);
    Fq neg;
    fq_sub(neg, *(const Fq *)&ONE_M, ONE_M);  // zero
    fq_sub(neg, neg, a.c1);
    fq_mul(r.c1, neg, d);
}

static void g2_normalize(Pt<Fq2> *pts, u64 n, u64 *xy_out) {
    for (u64 i = 0; i < n; i++) {
        if (pts[i].inf) {
            std::memset(xy_out + i * 16, 0, 128);
            continue;
        }
        Fq2 zinv, zi2, zi3;
        fq2_inv_mont(zinv, pts[i].z);
        fq2_sqr(zi2, zinv);
        fq2_mul(zi3, zi2, zinv);
        Fq2 x, y;
        fq2_mul(x, pts[i].x, zi2);
        fq2_mul(y, pts[i].y, zi3);
        Fq t;
        from_mont(t, x.c0); std::memcpy(xy_out + i * 16, t.l, 32);
        from_mont(t, x.c1); std::memcpy(xy_out + i * 16 + 4, t.l, 32);
        from_mont(t, y.c0); std::memcpy(xy_out + i * 16 + 8, t.l, 32);
        from_mont(t, y.c1); std::memcpy(xy_out + i * 16 + 12, t.l, 32);
    }
}

extern "C" {

// scalars[n*4] * gen (affine xy[8]) -> affine out[n*8]; zero xy = infinity
void fixed_base_g1(const u64 *gen_xy, const u64 *scalars, u64 n, u64 *out) {
    Fq x, y;
    std::memcpy(x.l, gen_xy, 32);
    std::memcpy(y.l, gen_xy + 4, 32);
    Pt<Fq> gen;
    gen.inf = false;
    to_mont(gen.x, x);
    to_mont(gen.y, y);
    gen.z = ONE_M;
    std::vector<Pt<Fq>> pts(n);
    fixed_base<Fq, G1>(gen, scalars, n, pts.data());
    g1_normalize(pts.data(), n, out);
}

void fixed_base_g2(const u64 *gen_xy, const u64 *scalars, u64 n, u64 *out) {
    Pt<Fq2> gen;
    gen.inf = false;
    Fq v;
    std::memcpy(v.l, gen_xy, 32);      to_mont(gen.x.c0, v);
    std::memcpy(v.l, gen_xy + 4, 32);  to_mont(gen.x.c1, v);
    std::memcpy(v.l, gen_xy + 8, 32);  to_mont(gen.y.c0, v);
    std::memcpy(v.l, gen_xy + 12, 32); to_mont(gen.y.c1, v);
    gen.z.c0 = ONE_M;
    std::memset(gen.z.c1.l, 0, 32);
    std::vector<Pt<Fq2>> pts(n);
    fixed_base<Fq2, G2>(gen, scalars, n, pts.data());
    g2_normalize(pts.data(), n, out);
}

}  // extern "C"
