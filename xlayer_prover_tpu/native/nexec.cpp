// Native Main SM fast-execution core.
//
// The TPU-native equivalent of the reference's generated fast executor
// (main_exec_generated_fast.cpp, emitted by src/main_generator/
// main_generator.cpp:26-80): the latency-critical ProcessBatch path runs
// the zkASM ROM at native speed.  Instead of generating code per zkPC,
// the ROM is pre-decoded into flat arrays (Python side:
// executor/nexec.py) and interpreted by this core; lines needing the
// command evaluator, storage (SMT), hashing or EC arithmetic are marked
// PYLINE and dispatched back to the Python interpreter on shared state
// (~17% of executed steps on the e2e vectors), everything else — register
// algebra, jumps, memory, binary ops, eq0 arithmetic — stays native.
//
// State is a flat uint64 block shared with Python (layout mirrored in
// executor/nexec.py); memory is a growable open-addressing map owned here
// with accessor entry points for the Python fallback path.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

typedef unsigned __int128 u128;

static const uint64_t GLP = 0xFFFFFFFF00000001ULL;

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
    u128 s = (u128)a + b;
    return (uint64_t)(s % GLP);
}
static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
    return (uint64_t)(((u128)a * b) % GLP);
}

// ---- state layout (u64 indices, mirrored in nexec.py) -------------------
enum {
    S_A = 0, S_B = 8, S_C = 16, S_D = 24, S_E = 32, S_SR = 40,
    S_CTX = 48, S_SP, S_PC, S_GAS, S_RR, S_HASHPOS, S_RCX, S_ZKPC,
    S_CARRY, S_STEP,
    S_CNT_STEPS, S_CNT_ARITH, S_CNT_BINARY, S_CNT_KECCAK, S_CNT_SHA,
    S_CNT_MEMALIGN, S_CNT_PADPG, S_CNT_POSG,
    S_SIZE = 32 + 24   // 56 slots reserved
};

// ---- line flags ---------------------------------------------------------
enum {
    F_MOP = 1u << 0, F_MWR = 1u << 1, F_USECTX = 1u << 2,
    F_ISSTACK = 1u << 3, F_ISMEM = 1u << 4, F_IND = 1u << 5,
    F_INDRR = 1u << 6, F_JMP = 1u << 7, F_JMPC = 1u << 8,
    F_JMPN = 1u << 9, F_JMPZ = 1u << 10, F_CALL = 1u << 11,
    F_RETURN = 1u << 12, F_USEJMPADDR = 1u << 13, F_USEELSE = 1u << 14,
    F_ASSERT = 1u << 15, F_BIN = 1u << 16, F_EQ0 = 1u << 17,
    F_REPEAT = 1u << 18, F_HASCONST = 1u << 19, F_HASCONSTL = 1u << 20,
    F_PYLINE = 1u << 21, F_FREE_DEFAULT = 1u << 22, F_INFREE = 1u << 23,
    F_INFREE0 = 1u << 24,
};

// selector indices (IN_FIELDS order from executor/rom.py)
enum {
    IN_A = 0, IN_B, IN_C, IN_D, IN_E, IN_SR, IN_CTX, IN_SP, IN_PC,
    IN_GAS, IN_STEP, IN_FREE, IN_FREE0, IN_RR, IN_HASHPOS, IN_CNT_ARITH,
    IN_CNT_BINARY, IN_CNT_KECCAK, IN_CNT_SHA, IN_CNT_MEMALIGN,
    IN_CNT_PADPG, IN_CNT_POSG, IN_ROTL_C, IN_RCX, NUM_IN
};

// setter bits (SET_FIELDS order)
enum {
    SET_A = 1u << 0, SET_B = 1u << 1, SET_C = 1u << 2, SET_D = 1u << 3,
    SET_E = 1u << 4, SET_SR = 1u << 5, SET_CTX = 1u << 6, SET_SP = 1u << 7,
    SET_PC = 1u << 8, SET_GAS = 1u << 9, SET_RR = 1u << 10,
    SET_HASHPOS = 1u << 11, SET_RCX = 1u << 12,
};

typedef int (*step_cb_t)(void* user, uint64_t zkpc, uint64_t step);

struct MemEntry { uint64_t addr; uint64_t val[8]; uint8_t used; };

struct Nexec {
    // decoded rom (borrowed numpy buffers; Python keeps them alive)
    uint64_t n_lines;
    const uint32_t* flags;
    const uint32_t* sets;
    const uint32_t* in_used;       // bitmask over NUM_IN
    const uint64_t* in_coeffs;     // (n_lines, NUM_IN)
    const uint64_t* const_limbs;   // (n_lines, 8)
    const int64_t* offset;
    const int32_t* jmp_addr;
    const int32_t* else_addr;
    const uint8_t* bin_opcode;

    uint64_t* st;                  // shared state block

    MemEntry* mem;
    uint64_t mem_cap;
    uint64_t mem_count;

    step_cb_t cb;
    void* cb_user;
};

// ---- memory map ---------------------------------------------------------
static void mem_init(Nexec* nx, uint64_t cap) {
    nx->mem_cap = cap;
    nx->mem_count = 0;
    nx->mem = (MemEntry*)calloc(cap, sizeof(MemEntry));
}

static MemEntry* mem_slot(Nexec* nx, uint64_t addr, int insert);

static void mem_grow(Nexec* nx) {
    MemEntry* old = nx->mem;
    uint64_t old_cap = nx->mem_cap;
    mem_init(nx, old_cap * 2);
    for (uint64_t i = 0; i < old_cap; i++) {
        if (old[i].used) {
            MemEntry* e = mem_slot(nx, old[i].addr, 1);
            memcpy(e->val, old[i].val, sizeof(old[i].val));
        }
    }
    free(old);
}

static MemEntry* mem_slot(Nexec* nx, uint64_t addr, int insert) {
    uint64_t mask = nx->mem_cap - 1;
    uint64_t h = (addr * 0x9E3779B97F4A7C15ULL) & mask;
    for (;;) {
        MemEntry* e = &nx->mem[h];
        if (e->used && e->addr == addr) return e;
        if (!e->used) {
            if (!insert) return nullptr;
            if (nx->mem_count * 4 >= nx->mem_cap * 3) {
                mem_grow(nx);
                return mem_slot(nx, addr, 1);
            }
            e->used = 1;
            e->addr = addr;
            memset(e->val, 0, sizeof(e->val));
            nx->mem_count++;
            return e;
        }
        h = (h + 1) & mask;
    }
}

// ---- 256-bit helpers (8 x 32-bit limbs in u64 slots) --------------------
static int fea_ok(const uint64_t* v) {
    for (int i = 0; i < 8; i++) if (v[i] >> 32) return 0;
    return 1;
}

// 256-bit from 8x32 limbs into 4x64 words
static void fea_to_words(const uint64_t* v, uint64_t* w) {
    for (int i = 0; i < 4; i++)
        w[i] = (v[2 * i] & 0xFFFFFFFFULL) | ((v[2 * i + 1] & 0xFFFFFFFFULL) << 32);
}
static void words_to_fea(const uint64_t* w, uint64_t* v) {
    for (int i = 0; i < 4; i++) {
        v[2 * i] = w[i] & 0xFFFFFFFFULL;
        v[2 * i + 1] = w[i] >> 32;
    }
}

static int words_lt(const uint64_t* a, const uint64_t* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] < b[i]) return 1;
        if (a[i] > b[i]) return 0;
    }
    return 0;
}

// returns carry; r = a + b
static uint64_t words_add(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + c;
        r[i] = (uint64_t)s;
        c = s >> 64;
    }
    return (uint64_t)c;
}
static uint64_t words_sub(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    int64_t borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 aa = a[i];
        u128 bb = (u128)b[i] + borrow;
        if (aa >= bb) { r[i] = (uint64_t)(aa - bb); borrow = 0; }
        else { r[i] = (uint64_t)((((u128)1) << 64) + aa - bb); borrow = 1; }
    }
    return (uint64_t)borrow;
}

// (binOpcode semantics of MainExecutor._binary_result)
static int binary_op(uint8_t opcode, const uint64_t* a, const uint64_t* b,
                     uint64_t* res, uint64_t* carry) {
    uint64_t r[4] = {0, 0, 0, 0};
    switch (opcode) {
        case 0: *carry = words_add(a, b, r); break;
        case 1: *carry = words_sub(a, b, r); break;
        case 2: r[0] = words_lt(a, b); *carry = r[0]; break;
        case 3: {  // SLT: signed 256-bit
            int sa = a[3] >> 63, sb = b[3] >> 63;
            uint64_t lt;
            if (sa != sb) lt = sa > sb;   // negative < positive
            else lt = words_lt(a, b);
            r[0] = lt; *carry = lt; break;
        }
        case 4: {
            int eq = memcmp(a, b, 32) == 0;
            r[0] = eq; *carry = eq; break;
        }
        case 5: {
            uint64_t nz = 0;
            for (int i = 0; i < 4; i++) { r[i] = a[i] & b[i]; nz |= r[i]; }
            *carry = nz != 0; break;
        }
        case 6: for (int i = 0; i < 4; i++) r[i] = a[i] | b[i]; *carry = 0; break;
        case 7: for (int i = 0; i < 4; i++) r[i] = a[i] ^ b[i]; *carry = 0; break;
        case 8: {
            uint64_t all = 1;
            for (int i = 0; i < 4; i++) if (a[i] >= b[i]) all = 0;
            r[0] = all; *carry = all; break;
        }
        default: return -1;
    }
    memcpy(res, r, 32);
    return 0;
}

// ---- public API ---------------------------------------------------------
void* nexec_new(uint64_t n_lines, const uint32_t* flags, const uint32_t* sets,
                const uint32_t* in_used, const uint64_t* in_coeffs,
                const uint64_t* const_limbs, const int64_t* offset,
                const int32_t* jmp_addr, const int32_t* else_addr,
                const uint8_t* bin_opcode, uint64_t* state,
                step_cb_t cb, void* cb_user) {
    Nexec* nx = (Nexec*)calloc(1, sizeof(Nexec));
    nx->n_lines = n_lines;
    nx->flags = flags; nx->sets = sets; nx->in_used = in_used;
    nx->in_coeffs = in_coeffs; nx->const_limbs = const_limbs;
    nx->offset = offset; nx->jmp_addr = jmp_addr;
    nx->else_addr = else_addr; nx->bin_opcode = bin_opcode;
    nx->st = state;
    nx->cb = cb; nx->cb_user = cb_user;
    mem_init(nx, 1 << 16);
    return nx;
}

void nexec_free(void* h) {
    Nexec* nx = (Nexec*)h;
    free(nx->mem);
    free(nx);
}

void nexec_mem_get(void* h, uint64_t addr, uint64_t* out8) {
    Nexec* nx = (Nexec*)h;
    MemEntry* e = mem_slot(nx, addr, 0);
    if (e) memcpy(out8, e->val, 64);
    else memset(out8, 0, 64);
}

void nexec_mem_set(void* h, uint64_t addr, const uint64_t* val8) {
    Nexec* nx = (Nexec*)h;
    MemEntry* e = mem_slot(nx, addr, 1);
    memcpy(e->val, val8, 64);
}

uint64_t nexec_mem_count(void* h) { return ((Nexec*)h)->mem_count; }

// error codes
enum {
    NX_OK = 0, NX_DONE = 1, NX_ERR_MAXSTEPS = -1, NX_ERR_ASSERT = -2,
    NX_ERR_MEM = -3, NX_ERR_BINARY = -4, NX_ERR_ARITH = -5,
    NX_ERR_FEA = -6, NX_ERR_JMPN = -7, NX_ERR_CB = -8, NX_ERR_ADDR = -9,
};

// run until stop_pc or max_steps; returns NX_DONE or error
int nexec_run(void* h, uint64_t start_pc, int64_t stop_pc,
              uint64_t max_steps) {
    Nexec* nx = (Nexec*)h;
    uint64_t* st = nx->st;
    st[S_ZKPC] = start_pc;

    for (uint64_t step = st[S_STEP]; ; step++) {
        if (step >= max_steps) return NX_ERR_MAXSTEPS;
        uint64_t zkpc = st[S_ZKPC];
        if ((int64_t)zkpc == stop_pc) { st[S_STEP] = step; return NX_DONE; }
        st[S_STEP] = step;
        st[S_CNT_STEPS] += 1;
        uint32_t fl = nx->flags[zkpc];

        if (fl & F_PYLINE) {
            int rc = nx->cb(nx->cb_user, zkpc, step);
            if (rc != 0) return NX_ERR_CB;
            continue;   // python advanced zkPC and counters
        }

        const uint64_t* coeffs = &nx->in_coeffs[zkpc * NUM_IN];
        uint32_t used = nx->in_used[zkpc];
        uint64_t op[8] = {0, 0, 0, 0, 0, 0, 0, 0};

        // vector selectors
        struct { int in; int reg; } vecs[6] = {
            {IN_A, S_A}, {IN_B, S_B}, {IN_C, S_C},
            {IN_D, S_D}, {IN_E, S_E}, {IN_SR, S_SR}};
        for (int k = 0; k < 6; k++) {
            if (used & (1u << vecs[k].in)) {
                uint64_t c = coeffs[vecs[k].in];
                for (int i = 0; i < 8; i++)
                    op[i] = gl_add(op[i], gl_mul(c, st[vecs[k].reg + i]));
            }
        }
        if (used & (1u << IN_ROTL_C)) {
            uint64_t c = coeffs[IN_ROTL_C];
            op[0] = gl_add(op[0], gl_mul(c, st[S_C + 7]));
            for (int i = 1; i < 8; i++)
                op[i] = gl_add(op[i], gl_mul(c, st[S_C + i - 1]));
        }
        // scalar selectors into limb 0
        struct { int in; uint64_t v; } scals[] = {
            {IN_CTX, st[S_CTX]}, {IN_SP, st[S_SP]}, {IN_PC, st[S_PC]},
            {IN_GAS, st[S_GAS]}, {IN_STEP, step}, {IN_RR, st[S_RR]},
            {IN_HASHPOS, st[S_HASHPOS]}, {IN_RCX, st[S_RCX]},
            {IN_CNT_ARITH, st[S_CNT_ARITH]},
            {IN_CNT_BINARY, st[S_CNT_BINARY]},
            {IN_CNT_KECCAK, st[S_CNT_KECCAK]},
            {IN_CNT_SHA, st[S_CNT_SHA]},
            {IN_CNT_MEMALIGN, st[S_CNT_MEMALIGN]},
            {IN_CNT_PADPG, st[S_CNT_PADPG]},
            {IN_CNT_POSG, st[S_CNT_POSG]}};
        for (unsigned k = 0; k < sizeof(scals) / sizeof(scals[0]); k++) {
            if (used & (1u << scals[k].in))
                op[0] = gl_add(op[0], gl_mul(coeffs[scals[k].in],
                                             scals[k].v % GLP));
        }
        if (fl & (F_HASCONST | F_HASCONSTL)) {
            const uint64_t* cl = &nx->const_limbs[zkpc * 8];
            for (int i = 0; i < 8; i++) op[i] = gl_add(op[i], cl[i]);
        }

        // address
        uint64_t addr = 0;
        uint32_t need_addr = F_MOP | F_JMP | F_JMPN | F_JMPC | F_JMPZ | F_CALL;
        if (fl & need_addr) {
            int64_t rel = nx->offset[zkpc];
            if (fl & F_IND) {
                uint64_t e0 = st[S_E];
                if (e0 <= 0x7FFFFFFFULL) rel += (int64_t)e0;
                else if (e0 >= GLP - 0x80000000ULL) rel += (int64_t)(e0 - GLP);
                else return NX_ERR_ADDR;
            }
            if (fl & F_INDRR) {
                uint64_t rr = st[S_RR];
                if (rr <= 0x7FFFFFFFULL) rel += (int64_t)rr;
                else if (rr >= GLP - 0x80000000ULL) rel += (int64_t)(rr - GLP);
                else return NX_ERR_ADDR;
            }
            if (fl & F_ISSTACK) rel += (int64_t)st[S_SP];
            if (rel < 0) return NX_ERR_ADDR;
            addr = (uint64_t)rel;
            if (fl & F_USECTX) addr += st[S_CTX] * 0x40000ULL;
            if (fl & F_ISSTACK) addr += 0x10000ULL;
            if (fl & F_ISMEM) addr += 0x20000ULL;
        }

        // free input (defaults only on native lines)
        uint64_t fi[8] = {0, 0, 0, 0, 0, 0, 0, 0};
        int have_fi = 0;
        if (fl & F_FREE_DEFAULT) {
            have_fi = 1;
            if ((fl & F_MOP) && !(fl & F_MWR)) {
                MemEntry* e = mem_slot(nx, addr, 0);
                if (e) memcpy(fi, e->val, 64);
            } else if (fl & F_BIN) {
                uint64_t aw[4], bw[4], rw[4], carry;
                if (!fea_ok(&st[S_A]) || !fea_ok(&st[S_B])) return NX_ERR_FEA;
                fea_to_words(&st[S_A], aw);
                fea_to_words(&st[S_B], bw);
                if (binary_op(nx->bin_opcode[zkpc], aw, bw, rw, &carry))
                    return NX_ERR_BINARY;
                words_to_fea(rw, fi);
            }
        }
        if (have_fi) {
            if (used & (1u << IN_FREE)) {
                uint64_t c = coeffs[IN_FREE];
                for (int i = 0; i < 8; i++)
                    op[i] = gl_add(op[i], gl_mul(c, fi[i]));
            }
            if (used & (1u << IN_FREE0))
                op[0] = gl_add(op[0], gl_mul(coeffs[IN_FREE0], fi[0]));
        }

        // memory op
        if (fl & F_MOP) {
            if (fl & F_MWR) {
                MemEntry* e = mem_slot(nx, addr, 1);
                memcpy(e->val, op, 64);
            } else {
                MemEntry* e = mem_slot(nx, addr, 0);
                uint64_t zero[8] = {0, 0, 0, 0, 0, 0, 0, 0};
                const uint64_t* v = e ? e->val : zero;
                if (memcmp(v, op, 64) != 0) return NX_ERR_MEM;
            }
        }

        // assert
        if (fl & F_ASSERT) {
            if (memcmp(&st[S_A], op, 64) != 0) return NX_ERR_ASSERT;
        }

        // binary check + carry
        if (fl & F_BIN) {
            uint64_t aw[4], bw[4], rw[4], ow[4], carry;
            if (!fea_ok(&st[S_A]) || !fea_ok(&st[S_B]) || !fea_ok(op))
                return NX_ERR_FEA;
            fea_to_words(&st[S_A], aw);
            fea_to_words(&st[S_B], bw);
            fea_to_words(op, ow);
            if (binary_op(nx->bin_opcode[zkpc], aw, bw, rw, &carry))
                return NX_ERR_BINARY;
            if (memcmp(rw, ow, 32) != 0) return NX_ERR_BINARY;
            st[S_CARRY] = carry;
            st[S_CNT_BINARY] += 1;
        }

        // arith eq0: A*B + C == D*2^256 + op
        if (fl & F_EQ0) {
            uint64_t aw[4], bw[4], cw[4], dw[4], ow[4];
            if (!fea_ok(&st[S_A]) || !fea_ok(&st[S_B]) || !fea_ok(&st[S_C])
                || !fea_ok(&st[S_D]) || !fea_ok(op)) return NX_ERR_FEA;
            fea_to_words(&st[S_A], aw);
            fea_to_words(&st[S_B], bw);
            fea_to_words(&st[S_C], cw);
            fea_to_words(&st[S_D], dw);
            fea_to_words(op, ow);
            // 512-bit product
            uint64_t prod[8] = {0};
            for (int i = 0; i < 4; i++) {
                u128 c = 0;
                for (int j = 0; j < 4; j++) {
                    u128 cur = (u128)aw[i] * bw[j] + prod[i + j] + c;
                    prod[i + j] = (uint64_t)cur;
                    c = cur >> 64;
                }
                prod[i + 4] = (uint64_t)c;
            }
            // + C
            u128 c = 0;
            for (int i = 0; i < 8; i++) {
                u128 cur = (u128)prod[i] + (i < 4 ? cw[i] : 0) + c;
                prod[i] = (uint64_t)cur;
                c = cur >> 64;
            }
            // compare low 4 words vs op, high 4 vs D
            if (memcmp(prod, ow, 32) != 0 || memcmp(prod + 4, dw, 32) != 0)
                return NX_ERR_ARITH;
            st[S_CNT_ARITH] += 1;
        }

        // setters
        uint32_t sets = nx->sets[zkpc];
        if (sets & SET_A) memcpy(&st[S_A], op, 64);
        if (sets & SET_B) memcpy(&st[S_B], op, 64);
        if (sets & SET_C) memcpy(&st[S_C], op, 64);
        if (sets & SET_D) memcpy(&st[S_D], op, 64);
        if (sets & SET_E) memcpy(&st[S_E], op, 64);
        if (sets & SET_SR) memcpy(&st[S_SR], op, 64);
        if (sets & SET_CTX) st[S_CTX] = op[0];
        if (sets & SET_SP) st[S_SP] = op[0];
        if (sets & SET_PC) st[S_PC] = op[0];
        if (sets & SET_GAS) st[S_GAS] = op[0];
        if (sets & SET_RR) st[S_RR] = op[0];
        if (sets & SET_HASHPOS) st[S_HASHPOS] = op[0];
        if (sets & SET_RCX) st[S_RCX] = op[0];

        // control flow
        uint64_t next_pc = zkpc + 1;
        uint64_t dest = (fl & F_USEJMPADDR) ? (uint64_t)nx->jmp_addr[zkpc]
                                            : addr;
        uint64_t else_dest = (fl & F_USEELSE) ? (uint64_t)nx->else_addr[zkpc]
                                              : zkpc + 1;
        if (fl & F_JMPN) {
            uint64_t v = op[0];
            if (v >= GLP - 0x100000000ULL) next_pc = dest;
            else if (v <= 0xFFFFFFFFULL) next_pc = else_dest;
            else return NX_ERR_JMPN;
        } else if (fl & F_JMPC) {
            next_pc = st[S_CARRY] ? dest : else_dest;
        } else if (fl & F_JMPZ) {
            next_pc = (op[0] == 0) ? dest : else_dest;
        } else if (fl & F_JMP) {
            next_pc = dest;
        } else if (fl & F_CALL) {
            st[S_RR] = zkpc + 1;
            next_pc = dest;
        } else if (fl & F_RETURN) {
            next_pc = st[S_RR];
        }

        if ((fl & F_REPEAT) && st[S_RCX] != 0) {
            st[S_RCX] = (st[S_RCX] - 1) % GLP;
            if (st[S_RCX] != 0) next_pc = zkpc;
        }

        st[S_ZKPC] = next_pc;
    }
}

}  // extern "C"
