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
    // per-counter OOC limits (0 = unlimited), same order as counters
    S_LIM_STEPS, S_LIM_ARITH, S_LIM_BINARY, S_LIM_KECCAK, S_LIM_SHA,
    S_LIM_MEMALIGN, S_LIM_PADPG, S_LIM_POSG,
    S_SIZE = 80
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
    F_EQ1 = 1u << 25, F_EQ2 = 1u << 26,       // native secp EC checks
    F_FN = 1u << 27,                          // native functionCall free-in
    F_EXPR = 1u << 28,                        // native expression free-in
    F_HASHA = 1u << 29,                       // native hashK/hashS append
    F_SRD = 1u << 30,                         // native SMT read (sRD)
    F_SWR = 1u << 31,                         // native SMT write (sWR)
};

// native functionCall ids (mirrored in executor/nexec.py)
enum {
    FN_XADD = 1, FN_YADD = 2, FN_XDBL = 3, FN_YDBL = 4, FN_INVFP = 5,
    FN_GETTXS = 6, FN_GETTXSLEN = 7,
};

// expression bytecode ops (mirrored in executor/nexec.py)
enum {
    EX_END = 0, EX_NUM = 1, EX_REG = 2,
    EX_ADD = 3, EX_SUB = 4, EX_MUL = 5, EX_DIV = 6, EX_MOD = 7,
    EX_BAND = 8, EX_BOR = 9, EX_BXOR = 10, EX_SHL = 11, EX_SHR = 12,
    EX_LT = 13, EX_GT = 14, EX_EQ = 15, EX_NE = 16, EX_NOT = 17,
    EX_BITNOT = 18, EX_MEM = 19, EX_VAR = 20,
};
// EX_REG operand codes: 0..5 vector regs A..SR; 6..12 scalars
enum {
    XR_A = 0, XR_B, XR_C, XR_D, XR_E, XR_SR,
    XR_CTX, XR_SP, XR_PC, XR_GAS, XR_RR, XR_HASHPOS, XR_RCX, XR_STEP,
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

// forward declarations (definitions below)
static int fea_ok(const uint64_t* v);
static void fea_to_words(const uint64_t* v, uint64_t* w);
static void u256_mul_wide(const uint64_t* a, const uint64_t* b, uint64_t* p8);

// slope cache: xAdd/yAdd (and xDbl/yDbl) are called back-to-back with the
// same register points; share the computed point between them.
struct EcCache {
    uint64_t key[8];      // x1,y1 or x1,y1,x2,y2 digest inputs
    uint64_t x3[4], y3[4];
    int kind;             // 1 = add, 2 = dbl, 0 = empty
};

// ---- native SMT store (fast-path sRD/sWR) --------------------------------
// Node map: Poseidon hash quad -> 12-limb node (data8 || capacity4), open
// addressing.  Nodes written natively are also appended to a log the
// Python side drains into its HashDB overlay (consolidation + py-line
// reads); Python-written nodes are pushed back via nexec_smt_write.
typedef int (*pose_fn_t)(uint64_t*);
static pose_fn_t g_pose = 0;    // injected from libzkcrypto

struct SmtSlot { uint64_t k[4]; uint64_t v[12]; uint8_t used; };

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
    const uint8_t* fn_id;          // native functionCall id per line
    const int64_t* expr_off;       // offset into expr_code (-1 = none)
    const uint64_t* expr_code;     // postfix bytecode arena

    uint64_t* st;                  // shared state block

    MemEntry* mem;
    uint64_t mem_cap;
    uint64_t mem_count;

    EcCache ec_cache;

    // batch L2 data (owned copy) for native getTxs/getTxsLen
    uint8_t* batch_data;
    uint64_t batch_len;

    // zkasm var mirror (borrowed numpy buffer, 5 u64 per var:
    // w0..w3 little-limb 256-bit value + valid flag; Python's
    // write-through vars dict keeps it current, and the native setVar
    // command path writes it directly — Python refreshes its dict from
    // the block at every callback boundary)
    uint64_t* var_block;
    uint64_t n_vars;

    // native setVar commands: per-line offset into expr_code with layout
    //   u64 n_before, n_before x { u64 slot, expr..EX_END },
    //   u64 n_after,  n_after  x { u64 slot, expr..EX_END }
    const int64_t* cmd_off;

    // staged var writes for the current line (visible to EX_VAR reads,
    // committed before/after the line body; dropped whole on defer)
    uint64_t stage_slot[16];
    uint64_t stage_val[16][4];
    int n_stage;
    int stage_visible;   // EX_VAR sees stage[0..stage_visible): growing
                         // during command staging, 0 during the line body
                         // (after-writes must stay invisible until commit)

    // hash append log: hashK/hashS bytes recorded natively, drained by
    // Python into ctx.hash_k/hash_s (HashState.write semantics) at every
    // callback boundary and at run end.  Record layout:
    //   u8 kind, u64 addr, u64 zkpc, u64 pos, u8 size, bytes[size]
    uint8_t* hlog;
    uint64_t hlog_len;
    uint64_t hlog_cap;

    step_cb_t cb;
    void* cb_user;

    // native SMT store + new-node log
    SmtSlot* smt;
    uint64_t smt_slots;       // power of two (0 = native SMT off)
    uint64_t smt_count;
    uint64_t* smt_log;        // 16 u64 per entry: key4 + node12
    uint64_t smt_log_len;     // entries
    uint64_t smt_log_cap;
};

static MemEntry* mem_slot(Nexec* nx, uint64_t addr, int insert);

// ---- 576-bit expression values (9 x u64) ---------------------------------
// Command-tree arithmetic is unbounded in the reference (mpz); the native
// evaluator covers the 576-bit envelope and DEFERS to Python on anything
// outside it (negative subtraction, >256-bit multiply operands, wide
// shifts) — bit-exactness by construction.

#define XN 9

static int x9_bits(const uint64_t* a) {
    for (int i = XN - 1; i >= 0; i--)
        if (a[i]) return i * 64 + 64 - __builtin_clzll(a[i]);
    return 0;
}

static int x9_add(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    u128 c = 0;
    for (int i = 0; i < XN; i++) {
        u128 s = (u128)a[i] + b[i] + c;
        r[i] = (uint64_t)s;
        c = s >> 64;
    }
    return c ? -1 : 0;     // overflow -> defer
}

static int x9_sub(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    u128 borrow = 0;
    for (int i = 0; i < XN; i++) {
        u128 bb = (u128)b[i] + borrow;
        if ((u128)a[i] >= bb) { r[i] = (uint64_t)((u128)a[i] - bb); borrow = 0; }
        else { r[i] = (uint64_t)((((u128)1) << 64) + a[i] - bb); borrow = 1; }
    }
    return borrow ? -1 : 0;   // negative -> defer
}

static int x9_mul(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    if (x9_bits(a) > 256 || x9_bits(b) > 256) return -1;   // defer
    uint64_t p8[8];
    u256_mul_wide(a, b, p8);
    memcpy(r, p8, 64);
    r[8] = 0;
    return 0;
}

static int x9_cmp(const uint64_t* a, const uint64_t* b) {
    for (int i = XN - 1; i >= 0; i--) {
        if (a[i] < b[i]) return -1;
        if (a[i] > b[i]) return 1;
    }
    return 0;
}

static int x9_is_zero(const uint64_t* a) {
    for (int i = 0; i < XN; i++) if (a[i]) return 0;
    return 1;
}

static void x9_shl1(uint64_t* a) {
    for (int i = XN - 1; i > 0; i--) a[i] = (a[i] << 1) | (a[i - 1] >> 63);
    a[0] <<= 1;
}

static void x9_shr1(uint64_t* a) {
    for (int i = 0; i < XN - 1; i++) a[i] = (a[i] >> 1) | (a[i + 1] << 63);
    a[XN - 1] >>= 1;
}

static int x9_shl(const uint64_t* a, uint64_t k, uint64_t* r) {
    if (k > 576 || x9_bits(a) + (int)k > 576) return -1;
    memcpy(r, a, XN * 8);
    uint64_t words = k / 64, bits = k % 64;
    if (words) {
        for (int i = XN - 1; i >= 0; i--)
            r[i] = (i >= (int)words) ? r[i - words] : 0;
    }
    if (bits) {
        for (int i = XN - 1; i > 0; i--)
            r[i] = (r[i] << bits) | (r[i - 1] >> (64 - bits));
        r[0] <<= bits;
    }
    return 0;
}

static void x9_shr(const uint64_t* a, uint64_t k, uint64_t* r) {
    if (k >= 576) { memset(r, 0, XN * 8); return; }
    memcpy(r, a, XN * 8);
    uint64_t words = k / 64, bits = k % 64;
    if (words) {
        for (int i = 0; i < XN; i++)
            r[i] = (i + words < XN) ? r[i + words] : 0;
    }
    if (bits) {
        for (int i = 0; i < XN - 1; i++)
            r[i] = (r[i] >> bits) | (r[i + 1] << (64 - bits));
        r[XN - 1] >>= bits;
    }
}

// long division: q = a / b, m = a % b (b != 0)
static void x9_divmod(const uint64_t* a, const uint64_t* b,
                      uint64_t* q, uint64_t* m) {
    uint64_t rem[XN];
    memset(q, 0, XN * 8);
    memset(rem, 0, XN * 8);
    int nb = x9_bits(a);
    for (int i = nb - 1; i >= 0; i--) {
        x9_shl1(rem);
        rem[0] |= (a[i / 64] >> (i % 64)) & 1;
        if (x9_cmp(rem, b) >= 0) {
            uint64_t t[XN];
            x9_sub(rem, b, t);
            memcpy(rem, t, XN * 8);
            q[i / 64] |= 1ULL << (i % 64);
        }
    }
    memcpy(m, rem, XN * 8);
}

#define EXPR_STACK 16

// evaluate postfix bytecode; returns 0 ok (res = 256-bit truncated? no —
// result must fit 256 bits for scalar_to_fea), -1 defer
static int expr_eval2(Nexec* nx, const uint64_t* code, uint64_t step,
                      uint64_t* res4, uint64_t* consumed) {
    uint64_t stack[EXPR_STACK][XN];
    int sp = 0;
    const uint64_t* st = nx->st;
    size_t pc = 0;
    for (;; ) {
        uint64_t op = code[pc++];
        if (op == EX_END) break;
        switch (op) {
            case EX_VAR: {
                if (sp >= EXPR_STACK) return -1;
                uint64_t slot = code[pc++];
                if (slot >= nx->n_vars || !nx->var_block) return -1;
                uint64_t* v = stack[sp];
                memset(v, 0, XN * 8);
                int staged = 0;
                for (int k = nx->stage_visible - 1; k >= 0; k--)
                    if (nx->stage_slot[k] == slot) {
                        memcpy(v, nx->stage_val[k], 32);
                        staged = 1;
                        break;
                    }
                if (!staged) {
                    const uint64_t* vb = &nx->var_block[slot * 5];
                    if (!vb[4]) return -1;        // unset / out-of-envelope
                    memcpy(v, vb, 32);
                }
                sp++;
                break;
            }
            case EX_NUM: {
                if (sp >= EXPR_STACK) return -1;
                memset(stack[sp], 0, XN * 8);
                memcpy(stack[sp], &code[pc], 32);
                pc += 4;
                sp++;
                break;
            }
            case EX_REG: {
                if (sp >= EXPR_STACK) return -1;
                uint64_t rc = code[pc++];
                uint64_t* v = stack[sp];
                memset(v, 0, XN * 8);
                if (rc <= XR_SR) {
                    static const int bases[6] =
                        {S_A, S_B, S_C, S_D, S_E, S_SR};
                    const uint64_t* fea = &st[bases[rc]];
                    if (!fea_ok(fea)) return -1;
                    fea_to_words(fea, v);
                } else {
                    uint64_t s;
                    switch (rc) {
                        case XR_CTX: s = st[S_CTX]; break;
                        case XR_SP: s = st[S_SP]; break;
                        case XR_PC: s = st[S_PC]; break;
                        case XR_GAS: s = st[S_GAS]; break;
                        case XR_RR: s = st[S_RR]; break;
                        case XR_HASHPOS: s = st[S_HASHPOS]; break;
                        case XR_RCX: s = st[S_RCX]; break;
                        case XR_STEP: s = step; break;
                        default: return -1;
                    }
                    v[0] = s;
                }
                sp++;
                break;
            }
            case EX_MEM: {
                if (sp >= EXPR_STACK) return -1;
                uint64_t addr = code[pc++];
                uint64_t* v = stack[sp];
                memset(v, 0, XN * 8);
                MemEntry* e = mem_slot(nx, addr, 0);
                if (e) {
                    if (!fea_ok(e->val)) return -1;
                    fea_to_words(e->val, v);
                }
                sp++;
                break;
            }
            case EX_NOT: case EX_BITNOT: {
                if (sp < 1) return -1;
                uint64_t* a = stack[sp - 1];
                if (op == EX_NOT) {
                    uint64_t z = x9_is_zero(a);
                    memset(a, 0, XN * 8);
                    a[0] = z;
                } else {
                    if (x9_bits(a) > 256) return -1;
                    for (int i = 0; i < 4; i++) a[i] = ~a[i];
                    for (int i = 4; i < XN; i++) a[i] = 0;
                }
                break;
            }
            default: {
                if (sp < 2) return -1;
                uint64_t* a = stack[sp - 2];
                uint64_t* b = stack[sp - 1];
                uint64_t r[XN];
                switch (op) {
                    case EX_ADD: if (x9_add(a, b, r)) return -1; break;
                    case EX_SUB: if (x9_sub(a, b, r)) return -1; break;
                    case EX_MUL: if (x9_mul(a, b, r)) return -1; break;
                    case EX_DIV:
                        if (x9_is_zero(b)) memset(r, 0, XN * 8);
                        else { uint64_t m[XN]; x9_divmod(a, b, r, m); }
                        break;
                    case EX_MOD:
                        if (x9_is_zero(b)) memset(r, 0, XN * 8);
                        else { uint64_t q[XN]; x9_divmod(a, b, q, r); }
                        break;
                    case EX_BAND:
                        for (int i = 0; i < XN; i++) r[i] = a[i] & b[i];
                        break;
                    case EX_BOR:
                        for (int i = 0; i < XN; i++) r[i] = a[i] | b[i];
                        break;
                    case EX_BXOR:
                        for (int i = 0; i < XN; i++) r[i] = a[i] ^ b[i];
                        break;
                    case EX_SHL:
                        if (x9_bits(b) > 16) return -1;
                        if (x9_shl(a, b[0], r)) return -1;
                        break;
                    case EX_SHR:
                        if (x9_bits(b) > 16) { memset(r, 0, XN * 8); break; }
                        x9_shr(a, b[0], r);
                        break;
                    case EX_LT: {
                        uint64_t v = x9_cmp(a, b) < 0;
                        memset(r, 0, XN * 8); r[0] = v; break;
                    }
                    case EX_GT: {
                        uint64_t v = x9_cmp(a, b) > 0;
                        memset(r, 0, XN * 8); r[0] = v; break;
                    }
                    case EX_EQ: {
                        uint64_t v = x9_cmp(a, b) == 0;
                        memset(r, 0, XN * 8); r[0] = v; break;
                    }
                    case EX_NE: {
                        uint64_t v = x9_cmp(a, b) != 0;
                        memset(r, 0, XN * 8); r[0] = v; break;
                    }
                    default: return -1;
                }
                memcpy(stack[sp - 2], r, XN * 8);
                sp--;
                break;
            }
        }
    }
    if (sp != 1) return -1;
    if (x9_bits(stack[0]) > 256) return -1;   // must fit scalar_to_fea
    memcpy(res4, stack[0], 32);
    if (consumed) *consumed = pc;
    return 0;
}

static int expr_eval(Nexec* nx, const uint64_t* code, uint64_t step,
                     uint64_t* res4) {
    return expr_eval2(nx, code, step, res4, 0);
}

// ---- memory map ---------------------------------------------------------
static void mem_init(Nexec* nx, uint64_t cap) {
    nx->mem_cap = cap;
    nx->mem_count = 0;
    nx->mem = (MemEntry*)calloc(cap, sizeof(MemEntry));
}

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

// ---- secp256k1 Fp arithmetic (p = 2^256 - 2^32 - 977) -------------------
// Used by the native ECRecover hot path (xAdd/yAdd/xDbl/yDbl point math
// and the arithEq1/eq2 checks) — the reference evaluates these through
// ffiasm RawFec (src/main_sm/fork_9/main/eval_command.cpp AddPointEc).

static const uint64_t SECP_P[4] = {
    0xFFFFFFFEFFFFFC2FULL, 0xFFFFFFFFFFFFFFFFULL,
    0xFFFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL};

static int u256_lt(const uint64_t* a, const uint64_t* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] < b[i]) return 1;
        if (a[i] > b[i]) return 0;
    }
    return 0;
}

static uint64_t u256_add(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + c;
        r[i] = (uint64_t)s;
        c = s >> 64;
    }
    return (uint64_t)c;
}

static uint64_t u256_sub(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 bb = (u128)b[i] + borrow;
        if ((u128)a[i] >= bb) { r[i] = (uint64_t)((u128)a[i] - bb); borrow = 0; }
        else { r[i] = (uint64_t)((((u128)1) << 64) + a[i] - bb); borrow = 1; }
    }
    return (uint64_t)borrow;
}

static void fp_norm(uint64_t* a) {
    while (!u256_lt(a, SECP_P)) { uint64_t t[4]; u256_sub(a, SECP_P, t);
        memcpy(a, t, 32); }
}

static void fp_add(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    uint64_t c = u256_add(a, b, r);
    if (c || !u256_lt(r, SECP_P)) { uint64_t t[4]; u256_sub(r, SECP_P, t);
        memcpy(r, t, 32); }
}

static void fp_sub(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    if (u256_sub(a, b, r)) { uint64_t t[4]; u256_add(r, SECP_P, t);
        memcpy(r, t, 32); }
}

// full 256x256 -> 512
static void u256_mul_wide(const uint64_t* a, const uint64_t* b, uint64_t* p8) {
    memset(p8, 0, 64);
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a[i] * b[j] + p8[i + j] + c;
            p8[i + j] = (uint64_t)cur;
            c = cur >> 64;
        }
        p8[i + 4] = (uint64_t)c;
    }
}

// r = x mod p, x = hi*2^256 + lo; 2^256 ≡ 2^32 + 977 =: K (fits u64)
static void fp_reduce512(const uint64_t* p8, uint64_t* r) {
    const uint64_t K = (1ULL << 32) + 977ULL;
    // fold hi*K into lo: hi*K is 256+42 bits -> (t5 words)
    uint64_t acc[5];
    memcpy(acc, p8, 32);
    acc[4] = 0;
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 cur = (u128)p8[4 + i] * K + acc[i] + carry;
        acc[i] = (uint64_t)cur;
        carry = cur >> 64;
    }
    u128 top = (u128)acc[4] + carry;          // < 2^43
    // fold top*2^256 ≡ top*K  (top*K < 2^86)
    u128 low = (u128)((uint64_t)top) * K;
    uint64_t add0 = (uint64_t)low;
    uint64_t add1 = (uint64_t)(low >> 64) + (uint64_t)(top >> 64) * K;
    u128 s = (u128)acc[0] + add0;
    r[0] = (uint64_t)s;
    s = (u128)acc[1] + add1 + (s >> 64);
    r[1] = (uint64_t)s;
    s = (u128)acc[2] + (s >> 64);
    r[2] = (uint64_t)s;
    s = (u128)acc[3] + (s >> 64);
    r[3] = (uint64_t)s;
    if (s >> 64) {                            // one more wrap (rare)
        uint64_t k4[4] = {K, 0, 0, 0};
        uint64_t t[4];
        u256_add(r, k4, t);
        memcpy(r, t, 32);
    }
    fp_norm(r);
}

static void fp_mul(const uint64_t* a, const uint64_t* b, uint64_t* r) {
    uint64_t p8[8];
    u256_mul_wide(a, b, p8);
    fp_reduce512(p8, r);
}

static int u256_is_zero(const uint64_t* a) {
    return (a[0] | a[1] | a[2] | a[3]) == 0;
}

static int u256_is_even(const uint64_t* a) { return (a[0] & 1) == 0; }

static void u256_shr1(uint64_t* a) {
    for (int i = 0; i < 3; i++) a[i] = (a[i] >> 1) | (a[i + 1] << 63);
    a[3] >>= 1;
}

// binary extended gcd: r = a^-1 mod p (a != 0, a < p)
static void fp_inv(const uint64_t* a, uint64_t* r) {
    uint64_t u[4], v[4], x1[4], x2[4];
    memcpy(u, a, 32);
    memcpy(v, SECP_P, 32);
    memset(x1, 0, 32); x1[0] = 1;
    memset(x2, 0, 32);
    while (!u256_is_zero(u) && !(u[0] == 1 && !(u[1] | u[2] | u[3]))) {
        while (u256_is_even(u)) {
            u256_shr1(u);
            if (u256_is_even(x1)) u256_shr1(x1);
            else {
                uint64_t c = u256_add(x1, SECP_P, x1);
                u256_shr1(x1);
                x1[3] |= c << 63;
            }
        }
        while (!u256_is_zero(v) && u256_is_even(v)) {
            u256_shr1(v);
            if (u256_is_even(x2)) u256_shr1(x2);
            else {
                uint64_t c = u256_add(x2, SECP_P, x2);
                u256_shr1(x2);
                x2[3] |= c << 63;
            }
        }
        if (!u256_lt(u, v)) {
            uint64_t t[4];
            u256_sub(u, v, t); memcpy(u, t, 32);
            fp_sub(x1, x2, x1);
        } else {
            uint64_t t[4];
            u256_sub(v, u, t); memcpy(v, t, 32);
            fp_sub(x2, x1, x2);
        }
    }
    if (u256_is_zero(u)) memcpy(r, x2, 32);   // gcd through v branch
    else memcpy(r, x1, 32);
}

// add: (x1,y1) + (x2,y2), x1 != x2 -> x3, y3;  returns 0 ok, -1 defer
static int ec_add_affine(const uint64_t* x1, const uint64_t* y1,
                         const uint64_t* x2, const uint64_t* y2,
                         uint64_t* x3, uint64_t* y3) {
    uint64_t dx[4], dy[4], inv[4], s[4], s2[4], t[4];
    fp_sub(x2, x1, dx);
    if (u256_is_zero(dx)) return -1;
    fp_sub(y2, y1, dy);
    fp_inv(dx, inv);
    fp_mul(dy, inv, s);
    fp_mul(s, s, s2);
    fp_sub(s2, x1, t);
    fp_sub(t, x2, x3);
    fp_sub(x1, x3, t);
    fp_mul(s, t, t);
    fp_sub(t, y1, y3);
    return 0;
}

static int ec_dbl_affine(const uint64_t* x1, const uint64_t* y1,
                         uint64_t* x3, uint64_t* y3) {
    uint64_t two_y[4], inv[4], s[4], s2[4], t[4], three_x2[4], x1sq[4];
    fp_add(y1, y1, two_y);
    if (u256_is_zero(two_y)) return -1;
    fp_mul(x1, x1, x1sq);
    fp_add(x1sq, x1sq, three_x2);
    fp_add(three_x2, x1sq, three_x2);
    fp_inv(two_y, inv);
    fp_mul(three_x2, inv, s);
    fp_mul(s, s, s2);
    fp_sub(s2, x1, t);
    fp_sub(t, x1, x3);
    fp_sub(x1, x3, t);
    fp_mul(s, t, t);
    fp_sub(t, y1, y3);
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

// ---- native SMT (reference Smt::set/get semantics; state/smt.py port) ----

static uint64_t smt_hash_mix(const uint64_t* k) {
    uint64_t h = 0x9E3779B97F4A7C15ULL;
    for (int i = 0; i < 4; i++) { h ^= k[i]; h *= 0xBF58476D1CE4E5B9ULL; h ^= h >> 29; }
    return h;
}

static void smt_table_grow(Nexec* nx, uint64_t slots);

static SmtSlot* smt_find(Nexec* nx, const uint64_t* key, int insert) {
    if (!nx->smt_slots) {
        if (!insert) return 0;
        smt_table_grow(nx, 1 << 16);
    }
    if (insert && (nx->smt_count + 1) * 10 > nx->smt_slots * 7)
        smt_table_grow(nx, nx->smt_slots * 2);
    uint64_t mask = nx->smt_slots - 1;
    uint64_t i = smt_hash_mix(key) & mask;
    for (;;) {
        SmtSlot* s = &nx->smt[i];
        if (!s->used) {
            if (!insert) return 0;
            memcpy(s->k, key, 32);
            s->used = 1;
            nx->smt_count++;
            return s;
        }
        if (memcmp(s->k, key, 32) == 0) return s;
        i = (i + 1) & mask;
    }
}

static void smt_table_grow(Nexec* nx, uint64_t slots) {
    SmtSlot* old = nx->smt;
    uint64_t old_slots = nx->smt_slots;
    nx->smt = (SmtSlot*)calloc(slots, sizeof(SmtSlot));
    nx->smt_slots = slots;
    nx->smt_count = 0;
    for (uint64_t i = 0; i < old_slots; i++)
        if (old[i].used) {
            SmtSlot* s = smt_find(nx, old[i].k, 1);
            memcpy(s->v, old[i].v, 96);
        }
    free(old);
}

// save node (data8 || cap4): hash, store, log; returns hash quad in out4
static void smt_save(Nexec* nx, const uint64_t* data8, const uint64_t* cap4,
                     uint64_t* out4) {
    uint64_t state[12];
    memcpy(state, data8, 64);
    memcpy(state + 8, cap4, 32);
    uint64_t node[12];
    memcpy(node, state, 96);
    g_pose(state);
    memcpy(out4, state, 32);
    SmtSlot* s = smt_find(nx, out4, 1);
    memcpy(s->v, node, 96);
    if (nx->smt_log_len + 1 > nx->smt_log_cap) {
        nx->smt_log_cap = nx->smt_log_cap ? nx->smt_log_cap * 2 : 1024;
        nx->smt_log = (uint64_t*)realloc(
            nx->smt_log, nx->smt_log_cap * 16 * sizeof(uint64_t));
    }
    uint64_t* rec = &nx->smt_log[nx->smt_log_len * 16];
    memcpy(rec, out4, 32);
    memcpy(rec + 4, node, 96);
    nx->smt_log_len++;
}

static inline int smt_key_bit(const uint64_t* key, int i) {
    return (key[i & 3] >> (i >> 2)) & 1;
}

static void smt_remove_key_bits(const uint64_t* key, int n, uint64_t* out) {
    int full = n / 4, rem = n % 4;
    for (int j = 0; j < 4; j++)
        out[j] = key[j] >> (full + (j < rem ? 1 : 0));
}

// prepend path bits bits[0..n) (SMT order) onto rkey
static void smt_join_key(const int* bits, int n, const uint64_t* rkey,
                         uint64_t* out) {
    uint64_t accs[4] = {0, 0, 0, 0};
    int cnt[4] = {0, 0, 0, 0};
    for (int i = 0; i < n; i++) {
        if (bits[i]) accs[i % 4] |= 1ULL << (i / 4);
        cnt[i % 4]++;
    }
    for (int j = 0; j < 4; j++)
        out[j] = ((rkey[j] << cnt[j]) | accs[j]);
}

static const uint64_t SMT_ZERO4[4] = {0, 0, 0, 0};

static int quad_zero(const uint64_t* q) {
    return (q[0] | q[1] | q[2] | q[3]) == 0;
}

static int smt_unique_sibling(const uint64_t* node12) {
    int n_found = 0, fnd = -1;
    for (int i = 0; i < 3; i++)
        if (!quad_zero(node12 + 4 * i)) { n_found++; fnd = i; }
    return n_found == 1 ? fnd : -1;
}

// save leaf from 256-bit value words: value node + leaf node
static void smt_save_leaf(Nexec* nx, const uint64_t* rkey,
                          const uint64_t* vw, uint64_t* out4) {
    uint64_t fea8[8];
    for (int i = 0; i < 8; i++)
        fea8[i] = (vw[i / 2] >> (32 * (i & 1))) & 0xFFFFFFFFULL;
    uint64_t vh[4];
    smt_save(nx, fea8, SMT_ZERO4, vh);
    uint64_t leaf8[8];
    memcpy(leaf8, rkey, 32);
    memcpy(leaf8 + 4, vh, 32);
    static const uint64_t CAP1[4] = {1, 0, 0, 0};
    smt_save(nx, leaf8, CAP1, out4);
}

static void smt_save_leaf_vh(Nexec* nx, const uint64_t* rkey,
                             const uint64_t* vh, uint64_t* out4) {
    uint64_t leaf8[8];
    memcpy(leaf8, rkey, 32);
    memcpy(leaf8 + 4, vh, 32);
    static const uint64_t CAP1[4] = {1, 0, 0, 0};
    smt_save(nx, leaf8, CAP1, out4);
}

#define SMT_MAXLVL 260

// get: value words + proof-hash counter; returns 0, or -1 on missing node
static int smt_get(Nexec* nx, const uint64_t* root, const uint64_t* key,
                   uint64_t* vw_out, uint64_t* phc_out) {
    memset(vw_out, 0, 32);
    uint64_t r[4];
    memcpy(r, root, 32);
    int level = 0, n_sib = 0;
    while (!quad_zero(r)) {
        SmtSlot* s = smt_find(nx, r, 0);
        if (!s) return -1;
        if (s->v[8] == 1) {       // leaf
            uint64_t rem[4];
            smt_remove_key_bits(key, level, rem);
            *phc_out = (uint64_t)n_sib + 2;
            if (memcmp(s->v, rem, 32) == 0) {
                SmtSlot* vn = smt_find(nx, s->v + 4, 0);
                if (!vn) return -1;
                for (int i = 0; i < 4; i++)
                    vw_out[i] = (vn->v[2 * i] & 0xFFFFFFFFULL)
                        | (vn->v[2 * i + 1] << 32);
            }
            return 0;
        }
        n_sib++;
        int side = smt_key_bit(key, level);
        memcpy(r, s->v + side * 4, 32);
        level++;
    }
    *phc_out = quad_zero(root) ? 0 : (uint64_t)n_sib;
    return 0;
}

// set (full insert/update/delete/restructure semantics); returns 0 or -1
// on a missing node (falls back to the Python path)
static int smt_set(Nexec* nx, const uint64_t* old_root, const uint64_t* key,
                   const uint64_t* vw, uint64_t* new_root,
                   uint64_t* phc_out) {
    uint64_t sib[SMT_MAXLVL][12];
    int acc_bits[SMT_MAXLVL];
    int n_acc = 0;
    uint64_t r[4];
    memcpy(r, old_root, 32);
    int level = 0, found = 0, n_sib = 0;
    uint64_t found_rkey[4] = {0}, found_vh[4] = {0}, found_vw[4] = {0};
    uint64_t found_key[4] = {0};
    int have_found_key = 0;

    while (!quad_zero(r) && !found) {
        if (level >= SMT_MAXLVL - 2) return -1;
        SmtSlot* s = smt_find(nx, r, 0);
        if (!s) return -1;
        memcpy(sib[level], s->v, 96);
        n_sib++;
        if (s->v[8] == 1) {
            found = 1;
            memcpy(found_rkey, s->v, 32);
            memcpy(found_vh, s->v + 4, 32);
            SmtSlot* vn = smt_find(nx, found_vh, 0);
            if (!vn) return -1;
            for (int i = 0; i < 4; i++)
                found_vw[i] = (vn->v[2 * i] & 0xFFFFFFFFULL)
                    | (vn->v[2 * i + 1] << 32);
            smt_join_key(acc_bits, n_acc, found_rkey, found_key);
            have_found_key = 1;
        } else {
            int side = smt_key_bit(key, level);
            memcpy(r, s->v + side * 4, 32);
            acc_bits[n_acc++] = side;
            level++;
        }
    }
    level -= 1;
    if (n_acc) n_acc--;

    uint64_t phc = 0;
    if (!quad_zero(old_root)) {
        phc = (uint64_t)(n_sib < level + 1 ? n_sib : level + 1);
        if (!quad_zero(found_vw)) phc += 2;
    }
    memcpy(new_root, old_root, 32);
    int value_zero = quad_zero(vw);
    int zero_to_zero = 0;

    if (!value_zero) {
        if (found && have_found_key && memcmp(found_key, key, 32) == 0) {
            // update
            uint64_t new_leaf[4];
            smt_save_leaf(nx, found_rkey, vw, new_leaf);
            phc += 2;
            if (level >= 0)
                memcpy(sib[level] + smt_key_bit(key, level) * 4, new_leaf,
                       32);
            else
                memcpy(new_root, new_leaf, 32);
        } else if (found) {
            // insertFound: split at the first differing bit
            int level2 = level + 1;
            while (smt_key_bit(key, level2)
                   == smt_key_bit(found_key, level2)) {
                level2++;
                if (level2 >= SMT_MAXLVL - 2) return -1;
            }
            uint64_t rem_old[4], rem_new[4];
            smt_remove_key_bits(found_key, level2 + 1, rem_old);
            uint64_t old_leaf[4];
            smt_save_leaf_vh(nx, rem_old, found_vh, old_leaf);
            smt_remove_key_bits(key, level2 + 1, rem_new);
            uint64_t new_leaf[4];
            smt_save_leaf(nx, rem_new, vw, new_leaf);
            uint64_t node8[8] = {0};
            memcpy(node8 + smt_key_bit(key, level2) * 4, new_leaf, 32);
            memcpy(node8 + smt_key_bit(found_key, level2) * 4, old_leaf,
                   32);
            uint64_t r2[4];
            smt_save(nx, node8, SMT_ZERO4, r2);
            phc += 4;
            level2--;
            while (level2 != level) {
                uint64_t n8[8] = {0};
                memcpy(n8 + smt_key_bit(key, level2) * 4, r2, 32);
                smt_save(nx, n8, SMT_ZERO4, r2);
                phc += 1;
                level2--;
            }
            if (level >= 0)
                memcpy(sib[level] + smt_key_bit(key, level) * 4, r2, 32);
            else
                memcpy(new_root, r2, 32);
        } else {
            // insertNotFound
            uint64_t rem[4];
            smt_remove_key_bits(key, level + 1, rem);
            uint64_t new_leaf[4];
            smt_save_leaf(nx, rem, vw, new_leaf);
            phc += 2;
            if (level >= 0)
                memcpy(sib[level] + smt_key_bit(key, level) * 4, new_leaf,
                       32);
            else
                memcpy(new_root, new_leaf, 32);
        }
    } else {
        if (found && have_found_key && memcmp(found_key, key, 32) == 0) {
            if (level >= 0) {
                memset(sib[level] + smt_key_bit(key, level) * 4, 0, 32);
                int u_key = smt_unique_sibling(sib[level]);
                int delete_found = 0;
                if (u_key >= 0) {
                    uint64_t sh[4];
                    memcpy(sh, sib[level] + u_key * 4, 32);
                    SmtSlot* sn = smt_find(nx, sh, 0);
                    if (!sn) return -1;
                    memcpy(sib[level + 1], sn->v, 96);
                    if (sn->v[8] == 1) {
                        delete_found = 1;
                        uint64_t vh[4];
                        memcpy(vh, sn->v + 4, 32);
                        phc += 2;
                        uint64_t ins_key[4];
                        acc_bits[n_acc] = u_key;
                        smt_join_key(acc_bits, n_acc + 1, sn->v, ins_key);
                        while (u_key >= 0 && level >= 0) {
                            level -= 1;
                            if (level >= 0)
                                u_key = smt_unique_sibling(sib[level]);
                        }
                        uint64_t rem[4];
                        smt_remove_key_bits(ins_key, level + 1, rem);
                        uint64_t old_leaf[4];
                        smt_save_leaf_vh(nx, rem, vh, old_leaf);
                        phc += 1;
                        if (level >= 0)
                            memcpy(sib[level]
                                   + smt_key_bit(key, level) * 4,
                                   old_leaf, 32);
                        else
                            memcpy(new_root, old_leaf, 32);
                    }
                }
                if (!delete_found) {
                    // deleteNotFound: one sibling-child probe for parity
                    int sibling_side = smt_key_bit(key, level) ? 0 : 1;
                    uint64_t sh[4];
                    memcpy(sh, sib[level] + sibling_side * 4, 32);
                    if (!quad_zero(sh) && !smt_find(nx, sh, 0)) return -1;
                    phc += 1;
                }
            } else {
                memcpy(new_root, SMT_ZERO4, 32);
            }
        } else {
            zero_to_zero = 1;
        }
    }

    // go up re-hashing
    while (level >= 0) {
        smt_save(nx, sib[level], sib[level] + 8, new_root);
        if (!zero_to_zero) phc += 1;
        level -= 1;
        if (level >= 0)
            memcpy(sib[level] + smt_key_bit(key, level) * 4, new_root, 32);
    }
    *phc_out = phc;
    return 0;
}

void nexec_set_poseidon(void* fn) { g_pose = (pose_fn_t)fn; }

void nexec_smt_write(void* h, const uint64_t* keys, const uint64_t* vals,
                     uint64_t n) {
    Nexec* nx = (Nexec*)h;
    for (uint64_t i = 0; i < n; i++) {
        SmtSlot* s = smt_find(nx, keys + i * 4, 1);
        memcpy(s->v, vals + i * 12, 96);
    }
}

uint64_t nexec_smt_log_len(void* h) { return ((Nexec*)h)->smt_log_len; }

void nexec_smt_drain(void* h, uint64_t* out) {
    Nexec* nx = (Nexec*)h;
    memcpy(out, nx->smt_log, nx->smt_log_len * 16 * sizeof(uint64_t));
    nx->smt_log_len = 0;
}

// ---- public API ---------------------------------------------------------
void* nexec_new(uint64_t n_lines, const uint32_t* flags, const uint32_t* sets,
                const uint32_t* in_used, const uint64_t* in_coeffs,
                const uint64_t* const_limbs, const int64_t* offset,
                const int32_t* jmp_addr, const int32_t* else_addr,
                const uint8_t* bin_opcode, const uint8_t* fn_id,
                const int64_t* expr_off, const uint64_t* expr_code,
                const int64_t* cmd_off,
                uint64_t* state, step_cb_t cb, void* cb_user) {
    Nexec* nx = (Nexec*)calloc(1, sizeof(Nexec));
    nx->n_lines = n_lines;
    nx->flags = flags; nx->sets = sets; nx->in_used = in_used;
    nx->in_coeffs = in_coeffs; nx->const_limbs = const_limbs;
    nx->offset = offset; nx->jmp_addr = jmp_addr;
    nx->else_addr = else_addr; nx->bin_opcode = bin_opcode;
    nx->fn_id = fn_id; nx->expr_off = expr_off; nx->expr_code = expr_code;
    nx->cmd_off = cmd_off;
    nx->st = state;
    nx->cb = cb; nx->cb_user = cb_user;
    mem_init(nx, 1 << 16);
    return nx;
}

void nexec_free(void* h) {
    Nexec* nx = (Nexec*)h;
    free(nx->mem);
    free(nx->batch_data);
    free(nx->hlog);
    free(nx->smt);
    free(nx->smt_log);
    free(nx);
}

void nexec_set_batch_data(void* h, const uint8_t* data, uint64_t len) {
    Nexec* nx = (Nexec*)h;
    free(nx->batch_data);
    nx->batch_data = 0;
    nx->batch_len = len;
    if (len) {
        nx->batch_data = (uint8_t*)malloc(len);
        memcpy(nx->batch_data, data, len);
    }
}

void nexec_set_var_block(void* h, uint64_t* block, uint64_t n_vars) {
    Nexec* nx = (Nexec*)h;
    nx->var_block = block;
    nx->n_vars = n_vars;
}

// hash append log ----------------------------------------------------------
static void hlog_append(Nexec* nx, uint8_t kind, uint64_t addr,
                        uint64_t zkpc, uint64_t pos, uint8_t size,
                        const uint8_t* bytes) {
    uint64_t need = nx->hlog_len + 1 + 8 + 8 + 8 + 1 + size;
    if (need > nx->hlog_cap) {
        uint64_t cap = nx->hlog_cap ? nx->hlog_cap * 2 : 4096;
        while (cap < need) cap *= 2;
        nx->hlog = (uint8_t*)realloc(nx->hlog, cap);
        nx->hlog_cap = cap;
    }
    uint8_t* p = nx->hlog + nx->hlog_len;
    *p++ = kind;
    memcpy(p, &addr, 8); p += 8;
    memcpy(p, &zkpc, 8); p += 8;
    memcpy(p, &pos, 8); p += 8;
    *p++ = size;
    memcpy(p, bytes, size);
    nx->hlog_len = need;
}

// drain: buf==NULL returns the byte count; otherwise copies up to cap
// bytes and resets the log (caller must size via the NULL call first)
int64_t nexec_hash_drain(void* h, uint8_t* buf, uint64_t cap) {
    Nexec* nx = (Nexec*)h;
    if (!buf) return (int64_t)nx->hlog_len;
    if (cap < nx->hlog_len) return -1;
    uint64_t n = nx->hlog_len;
    memcpy(buf, nx->hlog, n);
    nx->hlog_len = 0;
    return (int64_t)n;
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
    NX_ERR_OOC_BINARY = -10, NX_ERR_OOC_ARITH = -11,
    NX_ERR_OOC_POSG = -12,
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

        // native setVar commands: stage every before/after write first
        // (reads see staged values in order), then commit the before
        // writes; after writes commit at line end.  Any eval failure
        // defers the whole line with nothing committed.
        nx->n_stage = 0;
        nx->stage_visible = 0;
        int commit_after_from = 0;
        if (nx->cmd_off && nx->cmd_off[zkpc] >= 0) {
            const uint64_t* cp = &nx->expr_code[nx->cmd_off[zkpc]];
            int ok = 1;
            uint64_t counts[2] = {*cp++, 0};
            for (int half = 0; half < 2 && ok; half++) {
                if (half == 1) counts[1] = *cp++;
                for (uint64_t k = 0; k < counts[half] && ok; k++) {
                    uint64_t slot = *cp++, v4[4], adv = 0;
                    if (expr_eval2(nx, cp, step, v4, &adv) ||
                        nx->n_stage >= 16) { ok = 0; break; }
                    cp += adv;
                    nx->stage_slot[nx->n_stage] = slot;
                    memcpy(nx->stage_val[nx->n_stage], v4, 32);
                    nx->n_stage++;
                    nx->stage_visible = nx->n_stage;
                }
            }
            uint64_t nb = counts[0];
            if (!ok) {
                nx->n_stage = 0;
                nx->stage_visible = 0;
                int rc = nx->cb(nx->cb_user, zkpc, step);
                if (rc != 0) return NX_ERR_CB;
                continue;
            }
            commit_after_from = (int)nb;
            for (uint64_t k = 0; k < nb; k++) {
                uint64_t* vb = &nx->var_block[nx->stage_slot[k] * 5];
                memcpy(vb, nx->stage_val[k], 32);
                vb[4] = 1;
            }
            nx->stage_visible = 0;   // body reads committed block state
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
        uint32_t need_addr = F_MOP | F_JMP | F_JMPN | F_JMPC | F_JMPZ |
                             F_CALL | F_HASHA;
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
        uint64_t swr_sr[8];
        int have_swr = 0;
        if (fl & (F_SRD | F_SWR)) {
            // native SMT walk (reference pHashDB->get/set inside the Main
            // SM step, main_executor.cpp:282); any missing precondition
            // defers the line to the bit-identical Python path
            int ok = g_pose && nx->smt_slots && fea_ok(&st[S_SR]);
            uint64_t key4[4], old_root[4], phc = 0;
            if (ok) {
                uint64_t kin[12];
                for (int i = 0; i < 8; i++) kin[i] = st[S_C + i];
                for (int i = 8; i < 12; i++) kin[i] = 0;
                g_pose(kin);                     // cap = H(C || 0000)
                uint64_t kin1[12];
                for (int i = 0; i < 6; i++) kin1[i] = st[S_A + i];
                kin1[6] = st[S_B];
                kin1[7] = st[S_B + 1];
                memcpy(kin1 + 8, kin, 32);
                g_pose(kin1);                    // key = H(A,B || cap)
                memcpy(key4, kin1, 32);
                for (int j = 0; j < 4; j++)
                    old_root[j] = st[S_SR + 2 * j]
                        | (st[S_SR + 2 * j + 1] << 32);
            }
            if (ok && (fl & F_SRD)) {
                uint64_t vw[4];
                ok = smt_get(nx, old_root, key4, vw, &phc) == 0;
                if (ok) {
                    have_fi = 1;
                    for (int i = 0; i < 8; i++)
                        fi[i] = (vw[i / 2] >> (32 * (i & 1)))
                            & 0xFFFFFFFFULL;
                }
            } else if (ok) {
                uint64_t vw[4], nr[4];
                ok = fea_ok(&st[S_D]);
                if (ok) {
                    fea_to_words(&st[S_D], vw);
                    ok = smt_set(nx, old_root, key4, vw, nr, &phc) == 0;
                }
                if (ok) {
                    have_fi = 1;
                    for (int j = 0; j < 4; j++) {
                        fi[2 * j] = nr[j] & 0xFFFFFFFFULL;
                        fi[2 * j + 1] = nr[j] >> 32;
                    }
                    memcpy(swr_sr, fi, 64);
                    have_swr = 1;
                }
            }
            if (!ok) {
                int rc = nx->cb(nx->cb_user, zkpc, step);
                if (rc != 0) return NX_ERR_CB;
                continue;
            }
            st[S_CNT_POSG] += phc + 2;
            if (st[S_LIM_POSG] && st[S_CNT_POSG] > st[S_LIM_POSG])
                return NX_ERR_OOC_POSG;
        } else if (fl & F_FREE_DEFAULT) {
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
        } else if (fl & F_FN) {
            // native functionCall free input (register-form EC math); any
            // edge case (point at infinity, zero inverse, wide limbs)
            // defers the whole line to the Python interpreter, which
            // raises/handles identically.
            uint64_t x1[4], y1[4], x2[4], y2[4], rx[4], ry[4];
            int defer = 0;
            int fn0 = nx->fn_id[zkpc];
            int needs_regs = fn0 <= FN_INVFP;   // EC forms read A/B points
            if (needs_regs && (!fea_ok(&st[S_A]) || !fea_ok(&st[S_B])))
                defer = 1;
            if (!defer) {
                if (needs_regs) {
                    fea_to_words(&st[S_A], x1);
                    fea_to_words(&st[S_B], y1);
                }
                int fn = fn0;
                switch (fn) {
                    case FN_XADD: case FN_YADD: {
                        if (!fea_ok(&st[S_C]) || !fea_ok(&st[S_D]))
                            { defer = 1; break; }
                        fea_to_words(&st[S_C], x2);
                        fea_to_words(&st[S_D], y2);
                        // points must already be < p for the cached slope
                        if (!u256_lt(x1, SECP_P) || !u256_lt(y1, SECP_P) ||
                            !u256_lt(x2, SECP_P) || !u256_lt(y2, SECP_P))
                            { defer = 1; break; }
                        EcCache* c = &nx->ec_cache;
                        if (c->kind == 1 &&
                            !memcmp(c->key, x1, 32) &&
                            !memcmp(c->key + 4, x2, 32)) {
                            memcpy(rx, c->x3, 32);
                            memcpy(ry, c->y3, 32);
                        } else {
                            if (ec_add_affine(x1, y1, x2, y2, rx, ry))
                                { defer = 1; break; }
                            c->kind = 1;
                            memcpy(c->key, x1, 32);
                            memcpy(c->key + 4, x2, 32);
                            memcpy(c->x3, rx, 32);
                            memcpy(c->y3, ry, 32);
                        }
                        words_to_fea(fn == FN_XADD ? rx : ry, fi);
                        have_fi = 1;
                        break;
                    }
                    case FN_XDBL: case FN_YDBL: {
                        if (!u256_lt(x1, SECP_P) || !u256_lt(y1, SECP_P))
                            { defer = 1; break; }
                        EcCache* c = &nx->ec_cache;
                        if (c->kind == 2 &&
                            !memcmp(c->key, x1, 32) &&
                            !memcmp(c->key + 4, y1, 32)) {
                            memcpy(rx, c->x3, 32);
                            memcpy(ry, c->y3, 32);
                        } else {
                            if (ec_dbl_affine(x1, y1, rx, ry))
                                { defer = 1; break; }
                            c->kind = 2;
                            memcpy(c->key, x1, 32);
                            memcpy(c->key + 4, y1, 32);
                            memcpy(c->x3, rx, 32);
                            memcpy(c->y3, ry, 32);
                        }
                        words_to_fea(fn == FN_XDBL ? rx : ry, fi);
                        have_fi = 1;
                        break;
                    }
                    case FN_INVFP: {
                        uint64_t a[4];
                        memcpy(a, x1, 32);
                        fp_norm(a);
                        if (u256_is_zero(a)) { defer = 1; break; }
                        fp_inv(a, rx);
                        words_to_fea(rx, fi);
                        have_fi = 1;
                        break;
                    }
                    case FN_GETTXS: {
                        // ${getTxs(p, D)}: slice [p, p+D) of batchL2Data
                        // as the left-padded big-endian scalar
                        int64_t eo = nx->expr_off[zkpc];
                        if (eo < 0) { defer = 1; break; }
                        uint64_t o4[4], l4[4], used = 0;
                        const uint64_t* code = &nx->expr_code[eo];
                        if (expr_eval2(nx, code, step, o4, &used) ||
                            expr_eval2(nx, code + used, step, l4, 0))
                            { defer = 1; break; }
                        if (o4[1] | o4[2] | o4[3]) { defer = 1; break; }
                        if (l4[1] | l4[2] | l4[3] ||
                            l4[0] < 1 || l4[0] > 32) { defer = 1; break; }
                        uint64_t off = o4[0], len = l4[0], avail = 0;
                        if (off < nx->batch_len) {
                            avail = nx->batch_len - off;
                            if (avail > len) avail = len;
                        }
                        uint8_t be[32];
                        memset(be, 0, 32);
                        if (avail)
                            memcpy(be + 32 - avail, nx->batch_data + off,
                                   avail);
                        for (int i = 0; i < 8; i++) {
                            const uint8_t* q = be + 32 - 4 * (i + 1);
                            fi[i] = ((uint64_t)q[0] << 24) |
                                    ((uint64_t)q[1] << 16) |
                                    ((uint64_t)q[2] << 8) | q[3];
                        }
                        have_fi = 1;
                        break;
                    }
                    case FN_GETTXSLEN: {
                        fi[0] = nx->batch_len;
                        have_fi = 1;
                        break;
                    }
                    default: defer = 1;
                }
            }
            if (defer) {
                int rc = nx->cb(nx->cb_user, zkpc, step);
                if (rc != 0) return NX_ERR_CB;
                continue;
            }
        } else if (fl & F_EXPR) {
            if (expr_eval(nx, &nx->expr_code[nx->expr_off[zkpc]], step,
                          fi) == 0) {
                uint64_t w[4];
                memcpy(w, fi, 32);
                words_to_fea(w, fi);
                have_fi = 1;
            } else {
                int rc = nx->cb(nx->cb_user, zkpc, step);
                if (rc != 0) return NX_ERR_CB;
                continue;
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

        // hashK/hashS append: record op bytes at HASHPOS into the native
        // log (drained into ctx.hash_k/hash_s HashState by Python); any
        // out-of-envelope case defers the whole line so Python raises the
        // reference error (main_executor.cpp:2754-2761 value-beyond-size,
        // size out of range)
        if (fl & F_HASHA) {
            int is1 = nx->fn_id[zkpc] & 4;
            int kind = nx->fn_id[zkpc] & 3;   // 0=hashK 1=hashS 2=hashP
            uint64_t nbytes = is1 ? 1 : st[S_D];
            int bad = (nbytes < 1 || nbytes > 32 || !fea_ok(op));
            uint8_t be[32];
            if (!bad) {
                for (int i = 0; i < 8; i++) {
                    uint32_t limb = (uint32_t)op[i];
                    uint8_t* q = be + 32 - 4 * (i + 1);
                    q[0] = (uint8_t)(limb >> 24);
                    q[1] = (uint8_t)(limb >> 16);
                    q[2] = (uint8_t)(limb >> 8);
                    q[3] = (uint8_t)limb;
                }
                for (uint64_t i = 0; i < 32 - nbytes; i++)
                    if (be[i]) { bad = 1; break; }
            }
            if (bad) {
                int rc = nx->cb(nx->cb_user, zkpc, step);
                if (rc != 0) return NX_ERR_CB;
                continue;
            }
            hlog_append(nx, (uint8_t)kind, addr, zkpc, st[S_HASHPOS],
                        (uint8_t)nbytes, be + 32 - nbytes);
            st[S_HASHPOS] = gl_add(st[S_HASHPOS], nbytes);
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
            if (st[S_LIM_BINARY] && st[S_CNT_BINARY] > st[S_LIM_BINARY])
                return NX_ERR_OOC_BINARY;
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
            if (st[S_LIM_ARITH] && st[S_CNT_ARITH] > st[S_LIM_ARITH])
                return NX_ERR_OOC_ARITH;
        }

        // arith eq1/eq2: secp256k1 point add / double check
        // (main_sm._do_arith; reference sm_arith_eq1/eq2)
        if (fl & (F_EQ1 | F_EQ2)) {
            uint64_t x1[4], y1[4], x2[4], y2[4], x3[4], y3[4], ex[4], ey[4];
            if (!fea_ok(&st[S_A]) || !fea_ok(&st[S_B]) || !fea_ok(&st[S_C])
                || !fea_ok(&st[S_D]) || !fea_ok(&st[S_E]) || !fea_ok(op))
                return NX_ERR_FEA;
            fea_to_words(&st[S_A], x1);
            fea_to_words(&st[S_B], y1);
            fea_to_words(&st[S_C], x2);
            fea_to_words(&st[S_D], y2);
            fea_to_words(&st[S_E], ex);
            fea_to_words(op, ey);
            // register values can exceed p in principle; defer those
            if (!u256_lt(x1, SECP_P) || !u256_lt(y1, SECP_P) ||
                !u256_lt(x2, SECP_P) || !u256_lt(y2, SECP_P) ||
                !u256_lt(ex, SECP_P) || !u256_lt(ey, SECP_P)) {
                int rc = nx->cb(nx->cb_user, zkpc, step);
                if (rc != 0) return NX_ERR_CB;
                continue;
            }
            int bad;
            if (fl & F_EQ1) bad = ec_add_affine(x1, y1, x2, y2, x3, y3);
            else bad = ec_dbl_affine(x1, y1, x3, y3);
            if (bad || memcmp(x3, ex, 32) != 0 || memcmp(y3, ey, 32) != 0)
                return NX_ERR_ARITH;
            st[S_CNT_ARITH] += 1;
            if (st[S_LIM_ARITH] && st[S_CNT_ARITH] > st[S_LIM_ARITH])
                return NX_ERR_OOC_ARITH;
        }

        // setters
        if (have_swr) {
            // sWR writes the new root into SR before setters apply
            // (main_sm._do_storage sets regs.SR, then setters overwrite)
            memcpy(&st[S_SR], swr_sr, 64);
        }
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

        // commit staged cmd_after var writes (line completed natively)
        for (int k = commit_after_from; k < nx->n_stage; k++) {
            uint64_t* vb = &nx->var_block[nx->stage_slot[k] * 5];
            memcpy(vb, nx->stage_val[k], 32);
            vb[4] = 1;
        }
        nx->n_stage = 0;

        st[S_ZKPC] = next_pc;
    }
}

}  // extern "C"
