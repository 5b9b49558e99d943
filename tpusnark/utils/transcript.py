"""Fiat-Shamir transcript (SHA-256), mirroring gnark-crypto's
fiatshamir.Transcript discipline as used by the reference PLONK prover
(/root/reference/backend/plonk/bn254/prove.go:243 registers the challenges
"gamma", "beta", "alpha", "zeta"; each challenge hashes every binding made
since the previous challenge plus the previous challenge value).

Challenge bytes are reduced mod r into fr. Point binding uses the canonical
uncompressed big-endian (x || y) encoding (32+32 bytes for G1), infinity as
64 zero bytes — a stable wire format for self-consistent prove/verify.
(Bit-exact gnark transcript compatibility — their marshaling + hash-to-field
— is tracked as follow-up work; the transcript structure matches.)
"""

from __future__ import annotations

import hashlib


class Transcript:
    def __init__(self, challenge_names: list[str]):
        self._names = list(challenge_names)
        self._order = {n: i for i, n in enumerate(challenge_names)}
        self._bindings: dict[str, list[bytes]] = {n: [] for n in challenge_names}
        self._values: dict[str, bytes] = {}

    def bind(self, challenge: str, data: bytes):
        assert challenge in self._order, f"unknown challenge {challenge}"
        assert challenge not in self._values, f"challenge {challenge} already computed"
        self._bindings[challenge].append(bytes(data))

    def compute(self, challenge: str) -> bytes:
        """SHA256(name || prev_challenge || bindings...)."""
        if challenge in self._values:
            return self._values[challenge]
        idx = self._order[challenge]
        h = hashlib.sha256()
        h.update(challenge.encode())
        if idx > 0:
            prev = self._names[idx - 1]
            h.update(self.compute(prev))
        for b in self._bindings[challenge]:
            h.update(b)
        out = h.digest()
        self._values[challenge] = out
        return out

    def challenge_int(self, challenge: str, modulus: int) -> int:
        return int.from_bytes(self.compute(challenge), "big") % modulus


def fr_bytes(x: int) -> bytes:
    return int(x).to_bytes(32, "big")


def g1_bytes(pt) -> bytes:
    if pt is None:
        return b"\x00" * 64
    return int(pt[0]).to_bytes(32, "big") + int(pt[1]).to_bytes(32, "big")
