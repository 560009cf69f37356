"""fflonk: PLONK with folded commitments and ONE batched KZG opening.

Equivalent of the reference's rapidsnark fflonk prover
(src/rapidsnark/fflonk_prover.hpp, zkey_fflonk.cpp): the 14 PLONK
polynomials fold into three commitments

  C0(X) = qL(X^8) + X qR(X^8) + ... + X^7 Ssigma3(X^8)   (preprocessed)
  C1(X) = a(X^4) + X b(X^4) + X^2 c(X^4) + X^3 T0(X^4)
  C2(X) = z(X^3) + X T1(X^3) + X^2 T2(X^3)

opened on the 8th/4th/3rd roots of one evaluation point xi = xi_seed^24
(lcm(8,4,3) = 24, so every root set is a power of xi_seed times roots of
unity), then a single Shplonk pair (W, W') proves all openings with two
G1 points — the final proof is 4 G1 points + 15 field evaluations.

T0/T1(xi)/T2(xi) are NOT shipped: the verifier derives them from the
PLONK identities at xi, which is what binds the gate and permutation
equations.  The pairing check is
    e([L] + y [W'], [1]_2) == e([W'], [tau]_2),
with [L] assembled by the verifier from [C0], [C1], [C2], [W] and the
interpolated r_i(y) values.
"""

from __future__ import annotations

import dataclasses
import secrets
from typing import List

from ..fields import bn254
from ..fields.bn254 import (R, g1_add, g1_from_affine, g1_mul,
                            g1_to_affine)
from ..fields.bn254_tower import (FINAL_EXP, FQ12_ONE, G2_GEN, cast_g1,
                                  fq12_mul, fq12_pow, g2_mul, miller_loop,
                                  twist)
from ..native import keccak256
from .groth16 import _fr_root_of_unity, _msm, _ntt_fr
from .plonk import PlonkCircuit, wire_columns

K1 = 2
K2 = 3


# ---------------------------------------------------------------------------
# Fr polynomial helpers (coefficient lists, little-endian)
# ---------------------------------------------------------------------------

def _trim(p: List[int]) -> List[int]:
    while len(p) > 1 and p[-1] == 0:
        p = p[:-1]
    return p


def padd(p, q):
    n = max(len(p), len(q))
    return _trim([( (p[i] if i < len(p) else 0)
                  + (q[i] if i < len(q) else 0)) % R for i in range(n)])


def psub(p, q):
    n = max(len(p), len(q))
    return _trim([( (p[i] if i < len(p) else 0)
                  - (q[i] if i < len(q) else 0)) % R for i in range(n)])


def pscale(p, k):
    k %= R
    return _trim([v * k % R for v in p])


def pmul(p, q):
    p, q = _trim(p), _trim(q)
    out_len = len(p) + len(q) - 1
    if min(len(p), len(q)) <= 8:         # schoolbook for tiny operands
        out = [0] * out_len
        for i, a in enumerate(p):
            if a:
                for j, b in enumerate(q):
                    out[i + j] = (out[i + j] + a * b) % R
        return _trim(out)
    size = 1 << (out_len - 1).bit_length()
    fa = _ntt_fr(list(p) + [0] * (size - len(p)))
    fb = _ntt_fr(list(q) + [0] * (size - len(q)))
    fc = [a * b % R for a, b in zip(fa, fb)]
    return _trim(_ntt_fr(fc, inverse=True)[:out_len])


def peval(p, x):
    acc = 0
    for c in reversed(p):
        acc = (acc * x + c) % R
    return acc


def pdiv_zh(p, n):
    """Exact division by Z_H = X^n - 1."""
    r_ = list(p)
    q = [0] * max(1, len(p) - n)
    for i in range(len(p) - 1, n - 1, -1):
        q[i - n] = r_[i]
        r_[i - n] = (r_[i - n] + r_[i]) % R
        r_[i] = 0
    assert all(v == 0 for v in r_[:n]), "Z_H division not exact"
    return _trim(q)


def pdivmod(p, d):
    """Long division by a small-degree divisor d (monic not required)."""
    p = list(_trim(p))
    d = _trim(d)
    dn = len(d) - 1
    inv_lead = pow(d[-1], R - 2, R)
    q = [0] * max(1, len(p) - dn)
    for i in range(len(p) - 1, dn - 1, -1):
        c = p[i] * inv_lead % R
        if c:
            q[i - dn] = c
            for j in range(dn + 1):
                p[i - dn + j] = (p[i - dn + j] - c * d[j]) % R
    return _trim(q), _trim(p[:dn] or [0])


def _shift_omega(p, w):
    """p(X*w) coefficient scaling."""
    out = []
    cur = 1
    for c in p:
        out.append(c * cur % R)
        cur = cur * w % R
    return out


def _combine(polys: List[List[int]], t: int) -> List[int]:
    """C(X) = sum_i p_i(X^t) X^i."""
    out_len = t * max(len(p) for p in polys) + len(polys)
    out = [0] * out_len
    for i, p in enumerate(polys):
        for j, c in enumerate(p):
            out[t * j + i] = c
    return _trim(out)


def _vanishing(points: List[int]) -> List[int]:
    z = [1]
    for pt in points:
        z = pmul(z, [(-pt) % R, 1])
    return z


def _lagrange_at(points: List[int], values: List[int], y: int) -> int:
    acc = 0
    for i, (xi, vi) in enumerate(zip(points, values)):
        num = 1
        den = 1
        for j, xj in enumerate(points):
            if j != i:
                num = num * (y - xj) % R
                den = den * (xi - xj) % R
        acc = (acc + vi * num * pow(den, R - 2, R)) % R
    return acc


# ---------------------------------------------------------------------------
# setup / keys
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FflonkProvingKey:
    n: int
    n_public: int
    taus_g1: list            # [tau^i] G1 affine
    c0: tuple                # [C0] G1 affine
    polys: dict              # preprocessed coefficient polys
    sigma_cols: tuple        # S1,S2,S3 evaluations (for z)
    q_cols: dict             # selector columns (for T0 via evals)


@dataclasses.dataclass
class FflonkVerifyingKey:
    n: int
    n_public: int
    c0: tuple
    g2_gen: object
    g2_tau: object


@dataclasses.dataclass
class FflonkProof:
    c1: tuple
    c2: tuple
    w: tuple
    w2: tuple
    evals: dict              # name -> int


def _commit(taus_g1, poly):
    assert len(poly) <= len(taus_g1), (len(poly), len(taus_g1))
    nz = [(p, c) for p, c in zip(taus_g1, poly) if c]
    if not nz:
        return g1_to_affine(g1_mul(g1_from_affine(taus_g1[0]), 0))
    return _msm([p for p, _ in nz], [c for _, c in nz])


def setup(circuit: PlonkCircuit, rng=None):
    if rng is None:
        rng = secrets.SystemRandom()
    n = circuit.n
    tau = rng.randrange(1, R)
    max_pow = 10 * n + 40
    taus = [1] * (max_pow + 1)
    for i in range(1, max_pow + 1):
        taus[i] = taus[i - 1] * tau % R
    from .groth16 import _g1_batch
    taus_g1 = _g1_batch(taus)

    w = _fr_root_of_unity(n.bit_length() - 1)
    # selector columns
    q_cols = {k: [0] * n for k in ("qL", "qR", "qM", "qO", "qC")}
    for i, g in enumerate(circuit.gates):
        q_cols["qL"][i] = g.qL % R
        q_cols["qR"][i] = g.qR % R
        q_cols["qM"][i] = g.qM % R
        q_cols["qO"][i] = g.qO % R
        q_cols["qC"][i] = g.qC % R
    # sigma columns
    _cols, sigma = wire_columns(circuit, None)
    doms = [1] * n
    for i in range(1, n):
        doms[i] = doms[i - 1] * w % R

    def tag(slot):
        col, row = divmod(slot, n)
        return (1, K1, K2)[col] * doms[row] % R

    s_cols = ([0] * n, [0] * n, [0] * n)
    for col in range(3):
        for row in range(n):
            s_cols[col][row] = tag(sigma[col * n + row])

    polys = {}
    for name, colv in list(q_cols.items()) + [
            ("S1", s_cols[0]), ("S2", s_cols[1]), ("S3", s_cols[2])]:
        polys[name] = _trim(_ntt_fr(list(colv), inverse=True))
    c0_poly = _combine([polys[k] for k in
                        ("qL", "qR", "qM", "qO", "qC", "S1", "S2", "S3")], 8)
    c0 = _commit(taus_g1, c0_poly)
    pk = FflonkProvingKey(n=n, n_public=circuit.n_public, taus_g1=taus_g1,
                          c0=c0, polys=polys, sigma_cols=s_cols,
                          q_cols=q_cols)
    vk = FflonkVerifyingKey(n=n, n_public=circuit.n_public, c0=c0,
                            g2_gen=G2_GEN, g2_tau=g2_mul(G2_GEN, tau))
    return pk, vk


# ---------------------------------------------------------------------------
# transcript
# ---------------------------------------------------------------------------

class _FS:
    def __init__(self):
        self.state = b"fflonk"

    def absorb_point(self, pt):
        self.state = keccak256(self.state + int(pt[0]).to_bytes(32, "big")
                               + int(pt[1]).to_bytes(32, "big"))

    def absorb_scalar(self, v):
        self.state = keccak256(self.state + int(v).to_bytes(32, "big"))

    def challenge(self) -> int:
        self.state = keccak256(self.state)
        return int.from_bytes(self.state, "big") % R


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------

def prove(pk: FflonkProvingKey, circuit: PlonkCircuit, vals: List[int],
          publics: List[int], rng=None) -> FflonkProof:
    if rng is None:
        rng = secrets.SystemRandom()
    n = pk.n
    w = _fr_root_of_unity(n.bit_length() - 1)
    doms = [1] * n
    for i in range(1, n):
        doms[i] = doms[i - 1] * w % R

    (a_col, b_col, c_col), _sigma = wire_columns(circuit, vals)
    pi_col = [0] * n
    for i in range(pk.n_public):
        pi_col[i] = (-int(publics[i])) % R

    zh = [(R - 1)] + [0] * (n - 1) + [1]          # X^n - 1

    def blind(col, k):
        p = _trim(_ntt_fr(list(col), inverse=True))
        bs = [rng.randrange(R) for _ in range(k)]
        return padd(p, pmul(bs, zh))

    a_p = blind(a_col, 2)
    b_p = blind(b_col, 2)
    c_p = blind(c_col, 2)
    pi_p = _trim(_ntt_fr(list(pi_col), inverse=True))

    # T0 = (qM a b + qL a + qR b + qO c + qC + PI) / Z_H
    gate = padd(pmul(pk.polys["qM"], pmul(a_p, b_p)),
                padd(pmul(pk.polys["qL"], a_p),
                     padd(pmul(pk.polys["qR"], b_p),
                          padd(pmul(pk.polys["qO"], c_p),
                               padd(pk.polys["qC"], pi_p)))))
    t0 = pdiv_zh(gate, n)
    c1_poly = _combine([a_p, b_p, c_p, t0], 4)
    c1 = _commit(pk.taus_g1, c1_poly)

    fs = _FS()
    fs.absorb_point(pk.c0)
    for p in publics:
        fs.absorb_scalar(p)
    fs.absorb_point(c1)
    beta = fs.challenge()
    gamma = fs.challenge()

    # grand product z
    s1c, s2c, s3c = pk.sigma_cols
    z_col = [1] * n
    for i in range(n - 1):
        num = ((a_col[i] + beta * doms[i] + gamma)
               * (b_col[i] + beta * K1 * doms[i] + gamma)
               * (c_col[i] + beta * K2 * doms[i] + gamma)) % R
        den = ((a_col[i] + beta * s1c[i] + gamma)
               * (b_col[i] + beta * s2c[i] + gamma)
               * (c_col[i] + beta * s3c[i] + gamma)) % R
        z_col[i + 1] = z_col[i] * num * pow(den, R - 2, R) % R
    z_p = padd(_trim(_ntt_fr(list(z_col), inverse=True)),
               pmul([rng.randrange(R) for _ in range(3)], zh))

    l1 = pscale([1] * n, pow(n, R - 2, R))
    t1 = pdiv_zh(pmul(l1, psub(z_p, [1])), n)
    f_p = pmul(padd(a_p, [gamma, beta]),
               pmul(padd(b_p, [gamma, beta * K1 % R]),
                    padd(c_p, [gamma, beta * K2 % R])))
    g_p = pmul(padd(a_p, padd([gamma], pscale(pk.polys["S1"], beta))),
               pmul(padd(b_p, padd([gamma], pscale(pk.polys["S2"], beta))),
                    padd(c_p, padd([gamma], pscale(pk.polys["S3"], beta)))))
    zw = _shift_omega(z_p, w)
    t2 = pdiv_zh(psub(pmul(z_p, f_p), pmul(zw, g_p)), n)
    c2_poly = _combine([z_p, t1, t2], 3)
    c2 = _commit(pk.taus_g1, c2_poly)

    fs.absorb_point(c2)
    xi_seed = fs.challenge()
    xi = pow(xi_seed, 24, R)
    xiw = xi * w % R

    evals = {
        "a": peval(a_p, xi), "b": peval(b_p, xi), "c": peval(c_p, xi),
        "qL": peval(pk.polys["qL"], xi), "qR": peval(pk.polys["qR"], xi),
        "qM": peval(pk.polys["qM"], xi), "qO": peval(pk.polys["qO"], xi),
        "qC": peval(pk.polys["qC"], xi),
        "S1": peval(pk.polys["S1"], xi), "S2": peval(pk.polys["S2"], xi),
        "S3": peval(pk.polys["S3"], xi),
        "z": peval(z_p, xi), "zw": peval(z_p, xiw),
        "t1w": peval(t1, xiw), "t2w": peval(t2, xiw),
    }
    for k in sorted(evals):
        fs.absorb_scalar(evals[k])
    alpha = fs.challenge()

    # opening point sets
    s0_pts, s1_pts, s2_pts = _root_sets(xi_seed, n)
    c0_poly = _combine([pk.polys[k] for k in
                        ("qL", "qR", "qM", "qO", "qC", "S1", "S2", "S3")], 8)

    def open_quotient(cpoly, pts):
        zs = _vanishing(pts)
        vals_ = [peval(cpoly, p) for p in pts]
        # r = interpolation of cpoly on pts
        r_poly = _interp(pts, vals_)
        q, rem = pdivmod(psub(cpoly, r_poly), zs)
        assert rem == [0], "opening not exact"
        return q

    w_poly = padd(open_quotient(c0_poly, s0_pts),
                  padd(pscale(open_quotient(c1_poly, s1_pts), alpha),
                       pscale(open_quotient(c2_poly, s2_pts),
                              alpha * alpha % R)))
    w_c = _commit(pk.taus_g1, w_poly)
    fs.absorb_point(w_c)
    y = fs.challenge()

    # L(X) = sum_i alpha^i (Z_T/Z_Si)(y) (C_i(X) - r_i(y)) - Z_T(y) W(X)
    zt_y = 1
    for pts in (s0_pts, s1_pts, s2_pts):
        for p in pts:
            zt_y = zt_y * (y - p) % R
    l_poly = [0]
    for i, (cpoly, pts) in enumerate(((c0_poly, s0_pts),
                                      (c1_poly, s1_pts),
                                      (c2_poly, s2_pts))):
        zs_y = 1
        for p in pts:
            zs_y = zs_y * (y - p) % R
        coef = pow(alpha, i, R) * zt_y % R * pow(zs_y, R - 2, R) % R
        r_y = _lagrange_at(pts, [peval(cpoly, p) for p in pts], y)
        l_poly = padd(l_poly, pscale(psub(cpoly, [r_y]), coef))
    l_poly = psub(l_poly, pscale(w_poly, zt_y))
    w2_poly, rem = pdivmod(l_poly, [(-y) % R, 1])
    assert rem == [0], "L(y) != 0"
    w2_c = _commit(pk.taus_g1, w2_poly)
    return FflonkProof(c1=c1, c2=c2, w=w_c, w2=w2_c, evals=evals)


def _interp(points, values):
    """Lagrange interpolation -> coefficient poly (tiny point sets)."""
    acc = [0]
    for i, (xi, vi) in enumerate(zip(points, values)):
        term = [1]
        den = 1
        for j, xj in enumerate(points):
            if j != i:
                term = pmul(term, [(-xj) % R, 1])
                den = den * (xi - xj) % R
        acc = padd(acc, pscale(term, vi * pow(den, R - 2, R) % R))
    return acc


def _root_sets(xi_seed: int, n: int):
    """S0 = 8th roots of xi, S1 = 4th roots, S2 = 3rd roots of xi and of
    xi*w  (xi = xi_seed^24)."""
    w8 = _nth_root_of_unity(8)
    w4 = w8 * w8 % R
    w3 = _nth_root_of_unity(3)
    s0 = pow(xi_seed, 3, R)
    s1 = pow(xi_seed, 6, R)
    s2 = pow(xi_seed, 8, R)
    s0_pts = [s0 * pow(w8, k, R) % R for k in range(8)]
    s1_pts = [s1 * pow(w4, k, R) % R for k in range(4)]
    # cube root of the domain's omega
    w_n3 = _root_of_order(3 * n)
    s2b = s2 * w_n3 % R
    s2_pts = [s2 * pow(w3, k, R) % R for k in range(3)] + \
        [s2b * pow(w3, k, R) % R for k in range(3)]
    return s0_pts, s1_pts, s2_pts


def _nth_root_of_unity(k: int) -> int:
    return _root_of_order(k)


def _root_of_order(k: int) -> int:
    assert (R - 1) % k == 0, k
    g = 5                      # BN254 Fr multiplicative generator
    r_ = pow(g, (R - 1) // k, R)
    assert pow(r_, k, R) == 1 and pow(r_, k // 2 if k % 2 == 0 else k, R)
    return r_


# ---------------------------------------------------------------------------
# verify
# ---------------------------------------------------------------------------

def verify(vk: FflonkVerifyingKey, proof: FflonkProof,
           publics: List[int]) -> bool:
    n = vk.n
    w = _fr_root_of_unity(n.bit_length() - 1)
    ev = proof.evals

    fs = _FS()
    fs.absorb_point(vk.c0)
    for p in publics:
        fs.absorb_scalar(p)
    fs.absorb_point(proof.c1)
    beta = fs.challenge()
    gamma = fs.challenge()
    fs.absorb_point(proof.c2)
    xi_seed = fs.challenge()
    xi = pow(xi_seed, 24, R)
    for k in sorted(ev):
        fs.absorb_scalar(ev[k])
    alpha = fs.challenge()
    fs.absorb_point(proof.w)
    y = fs.challenge()

    zh_xi = (pow(xi, n, R) - 1) % R
    if zh_xi == 0:
        return False
    l1_xi = zh_xi * pow(n * (xi - 1) % R, R - 2, R) % R
    # PI(xi) from the publics (PI rows are the first gates)
    pi_xi = 0
    dom = 1
    lag_den_base = pow(n, R - 2, R)
    for i, p in enumerate(publics):
        li = zh_xi * dom % R * pow((xi - dom) % R, R - 2, R) % R \
            * lag_den_base % R
        pi_xi = (pi_xi - int(p) * li) % R
        dom = dom * w % R

    # derived quotient evaluations (binds the PLONK identities at xi)
    t0_xi = (ev["qM"] * ev["a"] * ev["b"] + ev["qL"] * ev["a"]
             + ev["qR"] * ev["b"] + ev["qO"] * ev["c"] + ev["qC"]
             + pi_xi) % R * pow(zh_xi, R - 2, R) % R
    t1_xi = l1_xi * (ev["z"] - 1) % R * pow(zh_xi, R - 2, R) % R
    f_xi = ((ev["a"] + beta * xi + gamma)
            * (ev["b"] + beta * K1 * xi + gamma)
            * (ev["c"] + beta * K2 * xi + gamma)) % R
    g_xi = ((ev["a"] + beta * ev["S1"] + gamma)
            * (ev["b"] + beta * ev["S2"] + gamma)
            * (ev["c"] + beta * ev["S3"] + gamma)) % R
    t2_xi = (ev["z"] * f_xi - ev["zw"] * g_xi) % R \
        * pow(zh_xi, R - 2, R) % R

    s0_pts, s1_pts, s2_pts = _root_sets(xi_seed, n)
    # restriction values of the combined polys on their root sets
    p0 = [ev[k] for k in ("qL", "qR", "qM", "qO", "qC", "S1", "S2", "S3")]
    v0 = [sum(p0[i] * pow(x, i, R) for i in range(8)) % R for x in s0_pts]
    p1 = [ev["a"], ev["b"], ev["c"], t0_xi]
    v1 = [sum(p1[i] * pow(x, i, R) for i in range(4)) % R for x in s1_pts]
    p2a = [ev["z"], t1_xi, t2_xi]
    p2b = [ev["zw"], ev["t1w"], ev["t2w"]]
    v2 = [sum(p2a[i] * pow(x, i, R) for i in range(3)) % R
          for x in s2_pts[:3]] + \
         [sum(p2b[i] * pow(x, i, R) for i in range(3)) % R
          for x in s2_pts[3:]]

    zt_y = 1
    for pts in (s0_pts, s1_pts, s2_pts):
        for p in pts:
            zt_y = zt_y * (y - p) % R

    # [L] = sum coef_i ([C_i] - r_i(y) G) - Z_T(y) [W]
    l_acc = None
    scalar_acc = 0
    for i, (c_pt, pts, vals_) in enumerate((
            (vk.c0, s0_pts, v0), (proof.c1, s1_pts, v1),
            (proof.c2, s2_pts, v2))):
        zs_y = 1
        for p in pts:
            zs_y = zs_y * (y - p) % R
        coef = pow(alpha, i, R) * zt_y % R * pow(zs_y, R - 2, R) % R
        r_y = _lagrange_at(pts, vals_, y)
        term = g1_mul(g1_from_affine(c_pt), coef)
        l_acc = term if l_acc is None else g1_add(l_acc, term)
        scalar_acc = (scalar_acc + coef * r_y) % R
    from .groth16 import _g1 as _g1_gen
    l_acc = g1_add(l_acc, g1_from_affine(
        _g1_gen((-scalar_acc) % R)))
    l_acc = g1_add(l_acc, g1_mul(g1_from_affine(proof.w),
                                 (-zt_y) % R))
    # e([L] + y [W'], [1]_2) == e([W'], [tau]_2)
    lhs_pt = g1_to_affine(g1_add(l_acc, g1_mul(g1_from_affine(proof.w2),
                                               y)))
    f = miller_loop(twist(vk.g2_gen), cast_g1(lhs_pt))
    neg_w2 = g1_to_affine(bn254.g1_neg(g1_from_affine(proof.w2)))
    f = fq12_mul(f, miller_loop(twist(vk.g2_tau), cast_g1(neg_w2)))
    return fq12_pow(f, FINAL_EXP) == FQ12_ONE
