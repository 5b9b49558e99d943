"""Groth16 verifier (host; pairing is not perf-critical — SURVEY.md §2.5).

Checks the Groth16 equation
    e(Ar, Bs) = e(alpha, beta) * e(kSum, gamma) * e(Krs, delta)
as a single product of Miller loops with one shared final exponentiation,
like the reference verifier (/root/reference/backend/groth16/bn254/verify.go:43-141).
"""

from __future__ import annotations

from ...curves import ref
from ...curves.ref import G1, G2, pairing_check
from .keys import Proof, VerifyingKey


class InvalidProofError(Exception):
    pass


def verify(proof: Proof, vk: VerifyingKey, public_inputs: list[int]) -> bool:
    """public_inputs: values of the public wires EXCLUDING the constant-one
    wire (gnark convention: witness.Public())."""
    p = ref.R
    pubs = [1] + [int(x) % p for x in public_inputs]
    if len(pubs) != len(vk.k):
        raise InvalidProofError(
            f"wrong number of public inputs: got {len(pubs) - 1}, want {len(vk.k) - 1}"
        )
    for pt in (proof.ar, proof.krs):
        if not G1.on_curve(pt):
            raise InvalidProofError("proof point not on curve")
    if not G2.on_curve(proof.bs):
        raise InvalidProofError("proof point not on curve")

    ksum = None
    for w, pt in zip(pubs, vk.k):
        if pt is None or w == 0:
            continue
        ksum = G1.add(ksum, G1.mul(pt, w))

    # e(-Ar,Bs) * e(alpha,beta) * e(kSum,gamma) * e(Krs,delta) == 1
    return pairing_check(
        [
            (G1.neg(proof.ar), proof.bs),
            (vk.alpha_g1, vk.beta_g2),
            (ksum, vk.gamma_g2),
            (proof.krs, vk.delta_g2),
        ]
    )
