"""PLONK setup: trace building, permutation, commitments.

Reference behavior being reproduced:
/root/reference/backend/plonk/bn254/setup.go:110-161 (Setup), :175
(BuildTrace: selector columns from the sparse gates), :304
(buildPermutation: sigma over 3n slots from wire equalities), :363
(computePermutationPolynomials: S1,S2,S3 interpolation + coset ids), :229
(commitTrace: KZG commitments of the 8 trace polynomials).

TPU-native: selector/sigma interpolations are device INTTs; coset tables
the prover's quotient loop needs (4n-domain evaluations of every fixed
polynomial, plus id/L1/Z_H^-1 tables) are precomputed here once into HBM.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...constraint.scs import SparseConstraintSystem
from ...fields.jfield import get_field
from ...fields.spec import BN254_FR
from ...poly import kzg
from ...poly.domain import Domain
from ...poly.ntt import get_ntt
from .keys import PlonkProvingKey, PlonkVerifyingKey

_fr = get_field(BN254_FR)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def pick_cosets(n: int, p: int) -> tuple[int, int]:
    """k1, k2 with H, k1 H, k2 H pairwise disjoint (k^n != 1 checks)."""
    ks = []
    k = 2
    while len(ks) < 2:
        ok = pow(k, n, p) != 1
        for prev in ks:
            ok = ok and pow(k * pow(prev, -1, p) % p, n, p) != 1
        if ok:
            ks.append(k)
        k += 1
    return ks[0], ks[1]


def build_permutation(cs: SparseConstraintSystem, n: int) -> list[int]:
    """sigma over 3n slots (slot = col*n + row). Wires' slot lists become
    cycles; padding slots are fixed points. Mirrors buildPermutation
    (setup.go:304)."""
    sigma = list(range(3 * n))
    slots_of_wire: dict[int, list[int]] = {}
    for row, g in enumerate(cs.gates):
        for col, w in enumerate((g.xa, g.xb, g.xc)):
            slots_of_wire.setdefault(w, []).append(col * n + row)
    for slots in slots_of_wire.values():
        m = len(slots)
        for i, s in enumerate(slots):
            sigma[s] = slots[(i + 1) % m]
    return sigma


def setup(cs: SparseConstraintSystem, srs: kzg.SRS | None = None, tau: int | None = None):
    """(pk, vk). srs must cover >= n+3 G1 powers (blinded wire polys)."""
    p = cs.modulus
    assert p == _fr.spec.modulus, "plonk backend is BN254-only for now"
    # n >= 8 so the quotient's 3 chunks (3n+6 coeffs) fit the 4n coset domain
    n = _next_pow2(max(8, cs.n_gates))
    if srs is None:
        srs = kzg.new_srs_unsafe(n + 3, tau=tau)
    assert len(srs.g1) >= n + 3, "SRS too small for domain"

    dom = Domain(BN254_FR, n)
    ntt_n = get_ntt(BN254_FR, n)
    ntt_4n = get_ntt(BN254_FR, 4 * n)
    f = _fr
    k1, k2 = pick_cosets(n, p)

    # ---- selector columns (ints, length n) ---------------------------------
    (_, _, _), q = cs.gate_arrays()
    pad = n - cs.n_gates
    q_evals = {name: vals + [0] * pad for name, vals in q.items()}

    # ---- permutation columns ------------------------------------------------
    sigma = build_permutation(cs, n)
    ks = (1, k1, k2)
    s_evals_int = {}
    for col, name in enumerate(("s1", "s2", "s3")):
        vals = []
        for row in range(n):
            t = sigma[col * n + row]
            tcol, trow = divmod(t, n)
            vals.append(ks[tcol] * dom.powers[trow] % p)
        s_evals_int[name] = vals

    # ---- interpolations (device INTT) + coset tables ------------------------
    def interp(evals):
        return ntt_n.intt(f.array(evals))  # (L, n) Montgomery coeffs

    def coset4(coeffs):
        padded = jnp.pad(coeffs, ((0, 0), (0, 4 * n - coeffs.shape[1])))
        return ntt_4n.ntt_coset(padded)

    name_map = {"qL": "ql", "qR": "qr", "qM": "qm", "qO": "qo", "qC": "qc"}
    q_coeffs = {name_map[k]: interp(v) for k, v in q_evals.items()}
    s_coeffs = {k: interp(v) for k, v in s_evals_int.items()}
    q_coset = {k: coset4(v) for k, v in q_coeffs.items()}
    s_coset = {k: coset4(v) for k, v in s_coeffs.items()}

    # id polynomials on the 4n coset: x, k1 x, k2 x
    big = ntt_4n.domain
    xs = [big.coset_shift * w % p for w in big.powers]  # host ints, length 4n
    id1 = f.array(xs)
    id_coset = {
        "id1": id1,
        "id2": f.array([k1 * x % p for x in xs]),
        "id3": f.array([k2 * x % p for x in xs]),
    }
    # L1(x) = (x^n - 1) / (n (x - 1)); Z_H^{-1}(x) = 1/(x^n - 1) on the coset
    zh = [(pow(x, n, p) - 1) % p for x in xs]
    n_inv = pow(n, -1, p)
    l1 = [z * n_inv % p * pow(x - 1, -1, p) % p for z, x in zip(zh, xs)]
    zh_inv = [pow(z, -1, p) for z in zh]
    l1_coset = f.array(l1)
    zh_inv_coset = f.array(zh_inv)

    # ---- commitments ---------------------------------------------------------
    def commit(coeffs_mont):
        return kzg.commit_dev(srs, f.from_mont(coeffs_mont))

    vk = PlonkVerifyingKey(
        n=n,
        generator=dom.generator,
        k1=k1,
        k2=k2,
        n_public=cs.n_public,
        ql=commit(q_coeffs["ql"]),
        qr=commit(q_coeffs["qr"]),
        qm=commit(q_coeffs["qm"]),
        qo=commit(q_coeffs["qo"]),
        qc=commit(q_coeffs["qc"]),
        s1=commit(s_coeffs["s1"]),
        s2=commit(s_coeffs["s2"]),
        s3=commit(s_coeffs["s3"]),
        g2=srs.g2,
    )
    pk = PlonkProvingKey(
        vk=vk,
        srs=srs,
        domain_n=n,
        q_coeffs=q_coeffs,
        s_coeffs=s_coeffs,
        q_coset=q_coset,
        s_coset=s_coset,
        id_coset=id_coset,
        l1_coset=l1_coset,
        zh_inv_coset=zh_inv_coset,
        s_evals_int=s_evals_int,
    )
    return pk, vk
