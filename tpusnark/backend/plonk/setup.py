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

    # ---- interpolations (device INTT) ---------------------------------------
    def interp(evals):
        return ntt_n.intt(f.array(evals))  # (L, n) Montgomery coeffs

    name_map = {"qL": "ql", "qR": "qr", "qM": "qm", "qO": "qo", "qC": "qc"}
    q_coeffs = {name_map[k]: interp(v) for k, v in q_evals.items()}
    s_coeffs = {k: interp(v) for k, v in s_evals_int.items()}

    # ---- BSB22 qcp selector columns (reference setup.go:90-107: 1 at each
    # committed row, rows already carry the public offset here) --------------
    qcp_coeffs = []
    for cm in cs.commitments:
        evals = [0] * n
        for r in cm.committed:
            evals[cs.n_public + r] = 1
        qcp_coeffs.append(interp(evals))

    # ---- rho-loop slice tables (gnark computeNumerator, prove.go:980-1045):
    # the 4n coset splits into 4 size-n cosets s_r * H with s_r = shift*w4^r;
    # evaluating any coefficient form on slice r = scale coeff i by s_r^i
    # then one size-n NTT. x^n is CONSTANT on a slice (= s_r^n), so Z_H and
    # the tail-fold of (n+k)-degree blinded polys are per-slice scalars.
    big = ntt_4n.domain
    w4 = big.generator
    shift = big.coset_shift
    slice_shift = [shift * pow(w4, r, p) % p for r in range(4)]
    slice_xn = [pow(s, n, p) for s in slice_shift]
    coset_scale = []
    for s in slice_shift:
        pows, acc = [], 1
        for _ in range(n):
            pows.append(acc)
            acc = acc * s % p
        coset_scale.append(f.array(pows))
    omega_pows = f.array(dom.powers)

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
        qcp=[commit(c) for c in qcp_coeffs],
        commitment_constraint_indexes=[cm.commitment_index for cm in cs.commitments],
    )
    pk = PlonkProvingKey(
        vk=vk,
        srs=srs,
        domain_n=n,
        q_coeffs=q_coeffs,
        s_coeffs=s_coeffs,
        coset_scale=coset_scale,
        omega_pows=omega_pows,
        slice_shift=slice_shift,
        slice_xn=slice_xn,
        s_evals_int=s_evals_int,
        qcp_coeffs=qcp_coeffs,
    )
    return pk, vk
