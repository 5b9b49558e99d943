"""FRI scheme tests: LDE correctness, proximity round-trip, tamper rejection.

Reference parity: the gnark-crypto `fri` package backing
/root/reference/backend/plonkfri/bn254.
"""

import random

import pytest

from tpusnark.fields.spec import BN254_FR
from tpusnark.poly.fri import FriParams, FriScheme, MerkleTree
from tpusnark.protocols.sumcheck import Transcript

P = BN254_FR.modulus
rng = random.Random(5)


def _poly(n):
    return [rng.randrange(P) for _ in range(n)]


def test_merkle_paths():
    leaves = [rng.randrange(P) for _ in range(16)]
    t = MerkleTree(leaves)
    for i in (0, 7, 15):
        assert MerkleTree.verify_path(t.root, i, leaves[i], t.path(i))
    assert not MerkleTree.verify_path(t.root, 3, leaves[3] + 1, t.path(3))
    assert not MerkleTree.verify_path(t.root, 3, leaves[4], t.path(4 ^ 1))


def test_lde_matches_direct_eval():
    fri = FriScheme(BN254_FR, 8, FriParams(blowup=4, n_queries=4, stop_degree=2))
    coeffs = _poly(8)
    cw = fri.lde(coeffs)
    # spot check a few positions against Horner at x = offset*omega^i
    for i in (0, 1, 13, 31):
        x = fri.offset * pow(fri.omega, i, P) % P
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % P
        assert cw[i] == acc


def test_fri_roundtrip():
    fri = FriScheme(BN254_FR, 64, FriParams(blowup=8, n_queries=10, stop_degree=4))
    coeffs = _poly(64)
    root, (cw, tree) = fri.commit(coeffs)
    proof = fri.prove_proximity(cw, Transcript(P))
    assert fri.verify_proximity(root, proof, Transcript(P))


def test_fri_rejects_tampered_value():
    fri = FriScheme(BN254_FR, 64, FriParams(blowup=8, n_queries=10, stop_degree=4))
    coeffs = _poly(64)
    root, (cw, tree) = fri.commit(coeffs)
    proof = fri.prove_proximity(cw, Transcript(P))
    proof.queries[0].layers[0].value = (proof.queries[0].layers[0].value + 1) % P
    assert not fri.verify_proximity(root, proof, Transcript(P))


def test_fri_rejects_high_degree():
    """A codeword of too-high degree must fail (w.h.p. every query chain
    breaks at the final-poly comparison)."""
    fri = FriScheme(BN254_FR, 64, FriParams(blowup=8, n_queries=10, stop_degree=4))
    # degree ~ N-1 garbage codeword: random evaluations
    cw = [rng.randrange(P) for _ in range(fri.N)]
    tree = MerkleTree(cw)
    with pytest.raises(AssertionError):
        # honest prover refuses: final layer fails the degree-bound assert
        fri.prove_proximity(cw, Transcript(P))


def test_fri_rejects_wrong_root():
    fri = FriScheme(BN254_FR, 32, FriParams(blowup=8, n_queries=6, stop_degree=4))
    c1, c2 = _poly(32), _poly(32)
    root1, (cw1, _) = fri.commit(c1)
    root2, (cw2, _) = fri.commit(c2)
    proof = fri.prove_proximity(cw1, Transcript(P))
    assert not fri.verify_proximity(root2, proof, Transcript(P))
