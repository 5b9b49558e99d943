"""FRI (Fast Reed-Solomon IOP of proximity) commitment scheme.

The gnark-crypto `fri` analog backing the PlonkFRI backend
(/root/reference/backend/plonkfri/bn254/{setup,prove,verify}.go): transparent
polynomial commitments — Merkle roots over Reed-Solomon codewords on a
multiplicative coset, radix-2 folding for the proximity proof, spot-check
queries with authentication paths.

Host-side big-int implementation: FRI work is O(N log N) bigint on domains a
few times the circuit size and is NOT the SNARK hot path (the reference's
plonkfri is likewise its experimental/non-accelerated backend). The LDEs
reuse Domain.ntt_ref; device NTT offload plugs in transparently if needed.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ..fields.spec import FieldSpec
from .domain import Domain


def _h(*parts: bytes) -> bytes:
    s = hashlib.sha256()
    for x in parts:
        s.update(x)
    return s.digest()


def _fe(v: int) -> bytes:
    return int(v).to_bytes(32, "big")


class MerkleTree:
    """sha256 binary Merkle tree over field-element leaves."""

    def __init__(self, leaves: list[int]):
        n = len(leaves)
        assert n & (n - 1) == 0
        self.n = n
        lv = [_h(_fe(v)) for v in leaves]
        levels = [lv]
        while len(lv) > 1:
            lv = [_h(lv[2 * i], lv[2 * i + 1]) for i in range(len(lv) // 2)]
            levels.append(lv)
        self.levels = levels

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def path(self, i: int) -> list[bytes]:
        out = []
        for lv in self.levels[:-1]:
            out.append(lv[i ^ 1])
            i >>= 1
        return out

    @staticmethod
    def verify_path(root: bytes, i: int, value: int, path: list[bytes]) -> bool:
        node = _h(_fe(value))
        for sib in path:
            node = _h(node, sib) if i & 1 == 0 else _h(sib, node)
            i >>= 1
        return node == root


@dataclass
class FriParams:
    blowup: int = 8       # inverse rate
    n_queries: int = 27   # ~ 80-bit proximity soundness at rate 1/8
    stop_degree: int = 8  # final layer sent in the clear


@dataclass
class FriLayerOpening:
    value: int          # v[i]
    sibling: int        # v[i + half]
    path: list[bytes]
    path_sib: list[bytes]


@dataclass
class FriQuery:
    index: int
    layers: list[FriLayerOpening]


@dataclass
class FriProof:
    layer_roots: list[bytes]
    final_poly: list[int]   # coefficients, degree < stop_degree
    queries: list[FriQuery] = field(default_factory=list)


class FriScheme:
    """Commit/open machinery over one evaluation coset of size N = blowup*n."""

    def __init__(self, spec: FieldSpec, max_degree_n: int, params: FriParams | None = None):
        self.spec = spec
        self.p = spec.modulus
        self.params = params or FriParams()
        self.n = max_degree_n              # committed polys have degree < n
        self.N = self.n * self.params.blowup
        self.dom = Domain(spec, self.N)
        self.offset = self.dom.mult_gen    # evaluation coset gH
        self.omega = self.dom.generator

    # --------------------------------------------------------------- commit
    def lde(self, coeffs: list[int]) -> list[int]:
        """Evaluations of the polynomial on the coset offset*<omega>."""
        p = self.p
        assert len(coeffs) <= self.n
        c = [v % p for v in coeffs] + [0] * (self.N - len(coeffs))
        off = 1
        for i in range(len(c)):
            c[i] = c[i] * off % p
            off = off * self.offset % p
        return self.dom.ntt_ref(c)

    def commit(self, coeffs: list[int]):
        """-> (root, (codeword, tree)) — keep the opaque handle for opening."""
        cw = self.lde(coeffs)
        t = MerkleTree(cw)
        return t.root, (cw, t)

    # ---------------------------------------------------- proximity (prove)
    def prove_proximity(self, codeword: list[int], transcript) -> FriProof:
        """Radix-2 FRI on a codeword claimed to be degree < n. Transcript
        supplies fold challenges + query indices (Fiat-Shamir)."""
        p = self.p
        layers = [codeword]
        trees = []
        roots = []
        offset = self.offset
        omega = self.omega
        cur = codeword
        offsets = [offset]
        omegas = [omega]
        while len(cur) > self.params.stop_degree * self.params.blowup:
            t = MerkleTree(cur)
            trees.append(t)
            roots.append(t.root)
            transcript.absorb(int.from_bytes(t.root, "big") % p)
            c = transcript.challenge()
            half = len(cur) // 2
            inv2 = pow(2, p - 2, p)
            nxt = [0] * half
            # x_i = offset*omega^i; f_next(x^2) = (f(x)+f(-x))/2 + c*(f(x)-f(-x))/(2x)
            xi = offset
            for i in range(half):
                a, b = cur[i], cur[i + half]
                s = (a + b) % p
                d = (a - b) * pow(xi, p - 2, p) % p
                nxt[i] = (s + c * d) % p * inv2 % p
                xi = xi * omega % p
            cur = nxt
            offset = offset * offset % p
            omega = omega * omega % p
            offsets.append(offset)
            omegas.append(omega)
            layers.append(cur)

        # final layer: interpolate to coefficients and send in the clear
        final_coeffs = self._interpolate_final(cur, offset, omega)
        for v in final_coeffs:
            transcript.absorb(v)

        # queries
        n_top = len(codeword)
        queries = []
        for _ in range(self.params.n_queries):
            idx = transcript.challenge() % (n_top // 2)
            q = FriQuery(idx, [])
            i = idx
            for lay, t in zip(layers[:-1], trees):
                half = len(lay) // 2
                i %= half
                q.layers.append(FriLayerOpening(
                    lay[i], lay[i + half], t.path(i), t.path(i + half)))
            queries.append(q)
        return FriProof(roots, final_coeffs, queries)

    def _interpolate_final(self, evals: list[int], offset: int, omega: int):
        """Coefficients of the final small layer (size = stop*blowup)."""
        p = self.p
        m = len(evals)
        # m is tiny: direct inverse DFT with the layer's actual omega/offset
        inv_m = pow(m, p - 2, p)
        coeffs = []
        w_inv = pow(omega, p - 2, p)
        for j in range(m):
            acc = 0
            wji = 1
            wj = pow(w_inv, j, p)
            for i in range(m):
                acc = (acc + evals[i] * wji) % p
                wji = wji * wj % p
            coeffs.append(acc * inv_m % p)
        off_inv = pow(offset, p - 2, p)
        o = 1
        for j in range(m):
            coeffs[j] = coeffs[j] * o % p
            o = o * off_inv % p
        # degree bound: everything above stop_degree must vanish
        assert all(c == 0 for c in coeffs[self.params.stop_degree:]), \
            "final layer exceeds degree bound"
        return coeffs[: self.params.stop_degree]

    # --------------------------------------------------- proximity (verify)
    def verify_proximity(self, top_root: bytes, proof: FriProof, transcript) -> bool:
        p = self.p
        # replay fold challenges
        challenges = []
        n_layers = len(proof.layer_roots)
        for root in proof.layer_roots:
            transcript.absorb(int.from_bytes(root, "big") % p)
            challenges.append(transcript.challenge())
        for v in proof.final_poly:
            transcript.absorb(v)
        if proof.layer_roots and proof.layer_roots[0] != top_root:
            return False

        inv2 = pow(2, p - 2, p)
        n_top = self.N
        for q in proof.queries:
            idx = transcript.challenge() % (n_top // 2)
            if q.index != idx:
                return False
            i_full = idx
            size = n_top
            offset, omega = self.offset, self.omega
            prev_val = None
            for li, (op, c) in enumerate(zip(q.layers, challenges)):
                half = size // 2
                i = i_full % half
                root = proof.layer_roots[li]
                if not MerkleTree.verify_path(root, i, op.value, op.path):
                    return False
                if not MerkleTree.verify_path(root, i + half, op.sibling, op.path_sib):
                    return False
                # the previous fold's output must reappear in this layer at
                # the carried index (low half -> value, high half -> sibling)
                here = op.value if i_full < half else op.sibling
                if prev_val is not None and here != prev_val:
                    return False
                xi = offset * pow(omega, i, p) % p
                s = (op.value + op.sibling) % p
                d = (op.value - op.sibling) * pow(xi, p - 2, p) % p
                prev_val = (s + c * d) % p * inv2 % p
                i_full = i
                size = half
                offset = offset * offset % p
                omega = omega * omega % p
            # check against the final polynomial
            x = offset * pow(omega, i_full, p) % p
            # note: after the last fold, the evaluation point of prev_val is
            # x_i on the folded domain of `size` elements
            acc = 0
            for c in reversed(proof.final_poly):
                acc = (acc * x + c) % p
            if prev_val != acc:
                return False
        return True
