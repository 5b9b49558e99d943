"""PLONK verifier.

Reference shape: /root/reference/backend/plonk/bn254/verify.go:45-... —
re-derive the Fiat-Shamir challenges, check the quotient identity at zeta,
then the batched KZG pairing checks. This backend uses the full-opening
variant (see keys.py): the identity check is a plain scalar equation over
the claimed evaluations, bound to the commitments by two KZG openings.
"""

from __future__ import annotations

from ...curves.ref import R
from ...poly import kzg
from ...utils.transcript import Transcript, fr_bytes, g1_bytes
from .keys import PlonkProof, PlonkVerifyingKey
from .prove import CHALLENGES, FOLD_ORDER


class InvalidPlonkProofError(Exception):
    pass


def verify(proof: PlonkProof, vk: PlonkVerifyingKey, public_inputs: list[int]) -> bool:
    p = R
    n = vk.n
    w = vk.generator
    pubs = [int(x) % p for x in public_inputs]
    if len(pubs) != vk.n_public:
        raise InvalidPlonkProofError(
            f"wrong number of public inputs: got {len(pubs)}, want {vk.n_public}"
        )

    # ---- re-derive challenges ------------------------------------------------
    tr = Transcript(list(CHALLENGES))
    for pt in vk.digest_points():
        tr.bind("gamma", g1_bytes(pt))
    for x in pubs:
        tr.bind("gamma", fr_bytes(x))
    for c in (proof.l_com, proof.r_com, proof.o_com):
        tr.bind("gamma", g1_bytes(c))
    gamma = tr.challenge_int("gamma", p)
    beta = tr.challenge_int("beta", p)
    tr.bind("alpha", g1_bytes(proof.z_com))
    alpha = tr.challenge_int("alpha", p)
    for c in (proof.h1_com, proof.h2_com, proof.h3_com):
        tr.bind("zeta", g1_bytes(c))
    zeta = tr.challenge_int("zeta", p)
    e = dict(proof.evals)
    for k in FOLD_ORDER:
        tr.bind("v", fr_bytes(e[k]))
    tr.bind("v", fr_bytes(proof.z_omega_zeta))
    v = tr.challenge_int("v", p)

    # ---- public-input polynomial at zeta --------------------------------------
    zh = (pow(zeta, n, p) - 1) % p
    if zh == 0:
        raise InvalidPlonkProofError("zeta landed in the domain")
    n_inv = pow(n, -1, p)
    pi = 0
    wi = 1
    for x in pubs:
        # L_i(zeta) = w^i (zeta^n - 1) / (n (zeta - w^i))
        li = wi * zh % p * n_inv % p * pow((zeta - wi) % p, -1, p) % p
        pi = (pi + x * li) % p
        wi = wi * w % p
    l1 = zh * n_inv % p * pow((zeta - 1) % p, -1, p) % p

    # ---- quotient identity at zeta --------------------------------------------
    lb, rb, ob, zb = e["l"], e["r"], e["o"], e["z"]
    gate = (
        e["ql"] * lb + e["qr"] * rb + e["qm"] * lb * rb + e["qo"] * ob + e["qc"] + pi
    ) % p
    num = (
        (lb + beta * zeta + gamma)
        * (rb + beta * vk.k1 * zeta + gamma)
        % p
        * ((ob + beta * vk.k2 * zeta + gamma) % p)
        % p
        * zb
        % p
    )
    den = (
        (lb + beta * e["s1"] + gamma)
        * (rb + beta * e["s2"] + gamma)
        % p
        * ((ob + beta * e["s3"] + gamma) % p)
        % p
        * proof.z_omega_zeta
        % p
    )
    perm = (num - den) % p
    lhs = (gate + alpha * perm + alpha * alpha % p * (l1 * (zb - 1) % p)) % p
    m = n + 2
    zm = pow(zeta, m, p)
    rhs = zh * ((e["h1"] + zm * e["h2"] + zm * zm % p * e["h3"]) % p) % p
    if lhs != rhs:
        return False

    # ---- KZG checks ------------------------------------------------------------
    srs_v = kzg.SRS(g1=[], g2=vk.g2)
    coms = {
        "l": proof.l_com,
        "r": proof.r_com,
        "o": proof.o_com,
        "z": proof.z_com,
        "s1": vk.s1,
        "s2": vk.s2,
        "s3": vk.s3,
        "ql": vk.ql,
        "qr": vk.qr,
        "qm": vk.qm,
        "qo": vk.qo,
        "qc": vk.qc,
        "h1": proof.h1_com,
        "h2": proof.h2_com,
        "h3": proof.h3_com,
    }
    ok = kzg.batch_verify_single_point(
        srs_v,
        [coms[k] for k in FOLD_ORDER],
        zeta,
        [e[k] for k in FOLD_ORDER],
        proof.w_zeta,
        v,
    )
    if not ok:
        return False
    omega_zeta = zeta * w % p
    return kzg.verify_opening(
        srs_v, proof.z_com, omega_zeta, proof.z_omega_zeta, proof.w_omega_zeta
    )
