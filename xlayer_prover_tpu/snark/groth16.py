"""Groth16 over BN254: setup, prover, verifier.

Equivalent of the reference's rapidsnark stage (src/rapidsnark/groth16.hpp:
37-40 prove; zkey loading in zkey_utils.cpp; invoked at prover.cpp:926-980
to wrap the recursiveF STARK into the on-chain SNARK).  The prover is
MSM-dominated and rides fields/bn254.py's Pippenger (device MSM is the
scale-up path); the verifier is the standard three-pairing check, which
also serves as the framework's own final self-check (the reference defers
to snarkjs in CI, prover_e2e.yml:38).

Setup here is a *test-environment* trusted setup (random toxic waste)
producing the same key material a snarkjs .zkey provides; snark/zkey.py
reads/writes the reference's zkey format so externally provided keys drop
in.
"""

from __future__ import annotations

import dataclasses
import secrets
from typing import List, Optional

from ..fields import bn254
from ..fields.bn254 import R, g1_add, g1_from_affine, g1_mul, g1_to_affine
from ..fields.bn254_tower import (G2_GEN, fq12_inv, fq12_mul, g2_mul,
                                  miller_loop, cast_g1, twist, fq12_pow,
                                  FINAL_EXP, FQ12_ONE)
from .r1cs import R1CS

G1_GEN = bn254.G1_GEN

# Fr multiplicative generator and 2-adicity (for the evaluation domain)
FR_GENERATOR = 5
FR_TWO_ADICITY = 28


def _fr_root_of_unity(bits: int) -> int:
    assert bits <= FR_TWO_ADICITY
    return pow(FR_GENERATOR, (R - 1) >> bits, R)


def _ntt_fr(vals: List[int], inverse: bool = False) -> List[int]:
    n = len(vals)
    bits = n.bit_length() - 1
    assert 1 << bits == n
    w = _fr_root_of_unity(bits)
    if inverse:
        w = pow(w, R - 2, R)
    # bit-reversal iterative radix-2
    a = list(vals)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        wl = pow(w, n // length, R)
        for i in range(0, n, length):
            cur = 1
            for k in range(i, i + length // 2):
                u, v = a[k], a[k + length // 2] * cur % R
                a[k] = (u + v) % R
                a[k + length // 2] = (u - v) % R
                cur = cur * wl % R
        length <<= 1
    if inverse:
        ninv = pow(n, R - 2, R)
        a = [x * ninv % R for x in a]
    return a


@dataclasses.dataclass
class ProvingKey:
    n_public: int
    n_wires: int
    domain_bits: int
    alpha1: tuple
    beta1: tuple
    beta2: tuple
    delta1: tuple
    delta2: tuple
    a_query: list          # [n_wires] G1
    b1_query: list         # [n_wires] G1
    b2_query: list         # [n_wires] G2
    c_query: list          # [n_wires] G1 (None for public wires)
    h_query: list          # [domain-1] G1


@dataclasses.dataclass
class VerifyingKey:
    alpha1: tuple
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    ic: list               # [n_public + 1] G1


@dataclasses.dataclass
class Proof:
    a: tuple               # G1 affine
    b: tuple               # G2 affine (pair of Fq2)
    c: tuple               # G1 affine


def _g1(k: int):
    return g1_to_affine(g1_mul(g1_from_affine(G1_GEN), k % R))


def _g2(k: int):
    return g2_mul(G2_GEN, k % R)


def _g1_batch(ks):
    """[k*G affine] for many scalars (native fixed-base when built)."""
    from ..native import fixed_base_g1
    res = fixed_base_g1(G1_GEN, ks)
    if res is not None:
        return res
    return [_g1(k) for k in ks]


def _g2_batch(ks):
    from ..native import fixed_base_g2
    res = fixed_base_g2(G2_GEN, ks)
    if res is not None:
        return res          # None entries = infinity, same as _g2(0)
    return [_g2(k) for k in ks]


def _wire_polys_at_tau(r1cs: R1CS, tau: int, domain_bits: int):
    """A_j(tau), B_j(tau), C_j(tau) for every wire j via Lagrange weights."""
    m = 1 << domain_bits
    w = _fr_root_of_unity(domain_bits)
    # L_k(tau) = (tau^m - 1) * w^k / (m * (tau - w^k))
    tm = (pow(tau, m, R) - 1) % R
    minv = pow(m, R - 2, R)
    # batch inversion of the m denominators (Montgomery trick)
    pows = []
    cur = 1
    for _k in range(m):
        pows.append(cur)
        cur = cur * w % R
    denoms = [(tau - c) % R for c in pows]
    prefix = [1] * (m + 1)
    for k in range(m):
        prefix[k + 1] = prefix[k] * denoms[k] % R
    inv_all = pow(prefix[m], R - 2, R)
    invs = [0] * m
    for k in range(m - 1, -1, -1):
        invs[k] = inv_all * prefix[k] % R
        inv_all = inv_all * denoms[k] % R
    lk = [tm * pows[k] % R * minv % R * invs[k] % R for k in range(m)]
    a_t = [0] * r1cs.n_wires
    b_t = [0] * r1cs.n_wires
    c_t = [0] * r1cs.n_wires
    for k, (a, b, c) in enumerate(r1cs.constraints):
        for wj, coef in a.items():
            a_t[wj] = (a_t[wj] + coef * lk[k]) % R
        for wj, coef in b.items():
            b_t[wj] = (b_t[wj] + coef * lk[k]) % R
        for wj, coef in c.items():
            c_t[wj] = (c_t[wj] + coef * lk[k]) % R
    return a_t, b_t, c_t


def setup(r1cs: R1CS, rng: Optional[object] = None):
    """Test-environment trusted setup (snarkjs zkey equivalent)."""
    rand = (lambda: secrets.randbelow(R - 1) + 1) if rng is None \
        else (lambda: rng.randrange(1, R))
    tau, alpha, beta, gamma, delta = (rand() for _ in range(5))
    m = max(2, len(r1cs.constraints))
    domain_bits = (m - 1).bit_length()
    m = 1 << domain_bits

    a_t, b_t, c_t = _wire_polys_at_tau(r1cs, tau, domain_bits)
    ginv = pow(gamma, R - 2, R)
    dinv = pow(delta, R - 2, R)

    a_query = _g1_batch(a_t)
    b1_query = _g1_batch(b_t)
    b2_query = _g2_batch(b_t)
    l_scalars = [(beta * a_t[j] + alpha * b_t[j] + c_t[j]) % R
                 for j in range(r1cs.n_wires)]
    ic_pts = _g1_batch([l_scalars[j] * ginv % R
                        for j in range(r1cs.n_public + 1)])
    c_pts = _g1_batch([l_scalars[j] * dinv % R
                       for j in range(r1cs.n_public + 1, r1cs.n_wires)])
    ic = list(ic_pts)
    c_query = [None] * (r1cs.n_public + 1) + list(c_pts)
    t_tau = (pow(tau, m, R) - 1) % R
    h_scalars = []
    cur = t_tau * dinv % R
    for _i in range(m - 1):
        h_scalars.append(cur)
        cur = cur * tau % R
    h_query = _g1_batch(h_scalars)

    pk = ProvingKey(n_public=r1cs.n_public, n_wires=r1cs.n_wires,
                    domain_bits=domain_bits,
                    alpha1=_g1(alpha), beta1=_g1(beta), beta2=_g2(beta),
                    delta1=_g1(delta), delta2=_g2(delta),
                    a_query=a_query, b1_query=b1_query, b2_query=b2_query,
                    c_query=c_query, h_query=h_query)
    vk = VerifyingKey(alpha1=_g1(alpha), beta2=_g2(beta), gamma2=_g2(gamma),
                      delta2=_g2(delta), ic=ic)
    return pk, vk


def _h_coefficients(r1cs: R1CS, witness: List[int], domain_bits: int):
    """h(x) = (A(x)B(x) - C(x)) / t(x) coefficient vector."""
    m = 1 << domain_bits
    a_e = [0] * m
    b_e = [0] * m
    c_e = [0] * m
    for k, (a, b, c) in enumerate(r1cs.constraints):
        a_e[k] = sum(witness[w] * v for w, v in a.items()) % R
        b_e[k] = sum(witness[w] * v for w, v in b.items()) % R
        c_e[k] = sum(witness[w] * v for w, v in c.items()) % R
    a_c = _ntt_fr(a_e, inverse=True)
    b_c = _ntt_fr(b_e, inverse=True)
    c_c = _ntt_fr(c_e, inverse=True)
    # multiply on a 2m domain
    a2 = _ntt_fr(a_c + [0] * m)
    b2 = _ntt_fr(b_c + [0] * m)
    c2 = _ntt_fr(c_c + [0] * m)
    d2 = [(x * y - z) % R for x, y, z in zip(a2, b2, c2)]
    d = _ntt_fr(d2, inverse=True)           # degree <= 2m-2
    # divide by t(x) = x^m - 1:  d_k = h_{k-m} - h_k, deg(h) <= m-2
    h = [0] * (2 * m)
    for k in range(2 * m - 1, m - 1, -1):
        h[k - m] = (d[k] + (h[k] if k < len(h) else 0)) % R
    # low coefficients must close the division: d_k = -h_k for k < m
    assert all((d[k] + h[k]) % R == 0 for k in range(m)), \
        "witness does not satisfy the R1CS"
    return h[:m - 1]


def _msm(points, scalars):
    pairs = [(p, s % R) for p, s in zip(points, scalars)
             if p is not None and s % R]
    if not pairs:
        return None
    from ..native import msm_g1 as native_msm_g1
    jac = native_msm_g1([p for p, _ in pairs], [s for _, s in pairs])
    if jac is not None:
        return g1_to_affine(jac)
    return g1_to_affine(bn254.msm([p for p, _ in pairs],
                                  [s for _, s in pairs]))


def prove(pk: ProvingKey, r1cs: R1CS, witness: List[int],
          rng: Optional[object] = None) -> Proof:
    assert len(witness) == pk.n_wires and witness[0] == 1
    rand = (lambda: secrets.randbelow(R)) if rng is None \
        else (lambda: rng.randrange(R))
    r_blind = rand()
    s_blind = rand()

    a_acc = _msm(pk.a_query, witness)
    b1_acc = _msm(pk.b1_query, witness)
    h = _h_coefficients(r1cs, witness, pk.domain_bits)
    h_acc = _msm(pk.h_query, h)
    c_acc = _msm(pk.c_query[pk.n_public + 1:],
                 witness[pk.n_public + 1:])

    def g1p(aff):
        return g1_from_affine(aff)

    a_pt = g1_add(g1p(a_acc) if a_acc else bn254.INF,
                  g1_add(g1p(pk.alpha1), g1_mul(g1p(pk.delta1), r_blind)))
    a_aff = g1_to_affine(a_pt)

    # B in G2
    from ..fields.bn254_tower import fq2_inv, fq2_mul, fq2_sqr, g2_add
    from ..native import msm_g2 as native_msm_g2
    b2_pairs = [(p, s % R) for p, s in zip(pk.b2_query, witness)
                if p is not None and s % R]
    b2_acc = None
    jac2 = native_msm_g2([p for p, _ in b2_pairs],
                         [s for _, s in b2_pairs]) if b2_pairs else None
    if jac2 is not None:
        x2, y2, z2 = jac2
        if z2 != (0, 0):
            zi = fq2_inv(z2)
            zi2 = fq2_sqr(zi)
            b2_acc = (fq2_mul(x2, zi2), fq2_mul(y2, fq2_mul(zi2, zi)))
    else:
        for p, s in b2_pairs:
            term = g2_mul(p, s)
            b2_acc = term if b2_acc is None else g2_add(b2_acc, term)
    b_pt = g2_add(b2_acc, g2_add(pk.beta2, g2_mul(pk.delta2, s_blind)))

    # B in G1 (for C)
    b1_pt = g1_add(g1p(b1_acc) if b1_acc else bn254.INF,
                   g1_add(g1p(pk.beta1), g1_mul(g1p(pk.delta1), s_blind)))

    c_pt = bn254.INF
    if c_acc:
        c_pt = g1_add(c_pt, g1p(c_acc))
    if h_acc:
        c_pt = g1_add(c_pt, g1p(h_acc))
    c_pt = g1_add(c_pt, g1_mul(a_pt, s_blind))
    c_pt = g1_add(c_pt, g1_mul(b1_pt, r_blind))
    c_pt = g1_add(c_pt, g1_mul(g1p(pk.delta1), (-r_blind * s_blind) % R))
    return Proof(a=a_aff, b=b_pt, c=g1_to_affine(c_pt))


def verify(vk: VerifyingKey, proof: Proof, public_inputs: List[int]) -> bool:
    """e(A,B) == e(alpha,beta) * e(IC(pub), gamma) * e(C, delta)."""
    assert len(public_inputs) == len(vk.ic) - 1
    acc = g1_from_affine(vk.ic[0])
    for ptv, v in zip(vk.ic[1:], public_inputs):
        acc = g1_add(acc, g1_mul(g1_from_affine(ptv), v % R))
    ic_aff = g1_to_affine(acc)

    neg_a = g1_to_affine(bn254.g1_neg(g1_from_affine(proof.a)))
    f = miller_loop(twist(proof.b), cast_g1(neg_a))
    f = fq12_mul(f, miller_loop(twist(vk.beta2), cast_g1(vk.alpha1)))
    f = fq12_mul(f, miller_loop(twist(vk.gamma2), cast_g1(ic_aff)))
    f = fq12_mul(f, miller_loop(twist(vk.delta2), cast_g1(proof.c)))
    return fq12_pow(f, FINAL_EXP) == FQ12_ONE
