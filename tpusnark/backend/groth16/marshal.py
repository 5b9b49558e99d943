"""Groth16 proof / verifying-key serialization in gnark's wire format.

Mirrors /root/reference/backend/groth16/bn254/marshal.go:
  Proof.WriteTo  -> Ar | Bs | Krs (compressed) | [u32 nbCommitments|points]
                    | CommitmentPok
  VK.WriteTo     -> G1.Alpha | G1.Beta | G2.Beta | G2.Gamma | G1.Delta
                    | G2.Delta | [u32 len(K) | K...]
                    | publicAndCommitmentCommitted | commitment key
(this backend has no BSB22 commitments yet, so the commitment sections
serialize as empty: nbCommitments == 0, empty committed list).
"""

from __future__ import annotations

import struct

from ...curves.marshal import (
    g1_compress,
    g1_decode,
    g1_raw,
    g2_compress,
    g2_decode,
    g2_raw,
)
from .keys import Proof, VerifyingKey


def proof_to_bytes(proof: Proof, raw: bool = False) -> bytes:
    eg1 = g1_raw if raw else g1_compress
    eg2 = g2_raw if raw else g2_compress
    out = eg1(proof.ar) + eg2(proof.bs) + eg1(proof.krs)
    out += struct.pack(">I", 0)  # no BSB22 commitments
    out += eg1(None)  # commitment PoK = infinity
    return out


def proof_from_bytes(data: bytes) -> Proof:
    off = 0
    ar, n = g1_decode(data[off:])
    off += n
    bs, n = g2_decode(data[off:])
    off += n
    krs, n = g1_decode(data[off:])
    off += n
    (nb_comm,) = struct.unpack_from(">I", data, off)
    off += 4
    for _ in range(nb_comm):
        _, n = g1_decode(data[off:])
        off += n
    return Proof(ar=ar, krs=krs, bs=bs)


def vk_to_bytes(vk: VerifyingKey, raw: bool = False) -> bytes:
    eg1 = g1_raw if raw else g1_compress
    eg2 = g2_raw if raw else g2_compress
    # gnark serializes vk.G1.Beta / vk.G1.Delta (= pk's values, carried for
    # compatibility, setup.go:326-327) between the G2 sections
    out = eg1(vk.alpha_g1) + eg1(vk.beta_g1) + eg2(vk.beta_g2)
    out += eg2(vk.gamma_g2) + eg1(vk.delta_g1) + eg2(vk.delta_g2)
    out += struct.pack(">I", len(vk.k))
    for pt in vk.k:
        out += eg1(pt)
    out += struct.pack(">I", 0)  # publicAndCommitmentCommitted: empty
    return out


def vk_from_bytes(data: bytes) -> VerifyingKey:
    off = 0
    alpha, n = g1_decode(data[off:])
    off += n
    beta_g1, n = g1_decode(data[off:])
    off += n
    beta_g2, n = g2_decode(data[off:])
    off += n
    gamma_g2, n = g2_decode(data[off:])
    off += n
    delta_g1, n = g1_decode(data[off:])
    off += n
    delta_g2, n = g2_decode(data[off:])
    off += n
    (nk,) = struct.unpack_from(">I", data, off)
    off += 4
    k = []
    for _ in range(nk):
        pt, n = g1_decode(data[off:])
        off += n
        k.append(pt)
    return VerifyingKey(
        alpha_g1=alpha,
        beta_g2=beta_g2,
        gamma_g2=gamma_g2,
        delta_g2=delta_g2,
        k=k,
        beta_g1=beta_g1,
        delta_g1=delta_g1,
    )
