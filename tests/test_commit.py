"""BSB22 commitment tests: frontend Commit -> Groth16 prove/verify with
Pedersen commitment + PoK.

Reference behavior being matched: frontend/cs/r1cs/api.go:683 (Commit),
backend/groth16/bn254/prove.go:84-134 (hint override + BatchProve),
verify.go:76-108 (challenge recompute + FoldCommitments + PoK check).
"""

import pytest

from tpusnark.backend import groth16
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder

P = BN254_FR.modulus


def _commit_circuit():
    """y == x^3 + c*x + 5 where c = Commit(x, pub) is the in-circuit
    challenge — the canonical BSB22 usage (challenge depends on witness)."""
    b = Builder(P)
    x = b.secret("x")
    pub = b.public("pub")
    c = b.commit(x, pub)
    x3 = b.mul(x, x, x)
    y = b.add(x3, b.mul(c, x), 5, pub)
    yp = b.public("y")
    b.assert_is_equal(y, yp)
    return b


def _solve_y(cs, x, pub):
    """Run the real prover-side challenge computation via solve to learn y."""
    from tpusnark.constraint.solver import solve

    # the placeholder is deterministic, but the PROVER overrides it; compute
    # y through a throwaway setup+solve with the real override
    pk, vk = groth16.setup(cs, rng=_rng(7))
    import tpusnark.backend.groth16.prove as pr

    # reach the real challenge by proving once with a dummy y then reading W
    # simpler: replicate via pedersen_commit + hash_to_field
    from tpusnark.curves.marshal import g1_raw
    from tpusnark.curves.pedersen import pedersen_commit
    from tpusnark.utils.hash_to_field import COMMITMENT_DST, hash_to_field

    cm = cs.commitments[0]
    C = pedersen_commit(pk.commitment_keys[0], [x % P])
    msg = g1_raw(C) + int(pub).to_bytes(32, "big")
    (c,) = hash_to_field(msg, COMMITMENT_DST, P)
    y = (pow(x, 3, P) + c * x + 5 + pub) % P
    return pk, vk, y


def _rng(seed):
    import random

    st = random.Random(seed)
    return lambda: st.randrange(1, P)


def test_commit_metadata():
    b = _commit_circuit()
    cs = b.compile()
    assert len(cs.commitments) == 1
    cm = cs.commitments[0]
    assert cm.nb_public_committed == 1
    assert len(cm.public_and_commitment_committed) == 1
    assert len(cm.private_committed) == 1
    # committed public wire is the declared public input
    w = cm.public_and_commitment_committed[0]
    assert cs.public_names[w] == "pub"


def test_commit_cs_serialization_roundtrip():
    from tpusnark.constraint.serialize import dump, load

    cs = _commit_circuit().compile()
    cs2 = load(dump(cs))
    assert len(cs2.commitments) == 1
    a, b2 = cs.commitments[0], cs2.commitments[0]
    assert a.public_and_commitment_committed == b2.public_and_commitment_committed
    assert a.private_committed == b2.private_committed
    assert a.commitment_index == b2.commitment_index
    assert a.nb_public_committed == b2.nb_public_committed


def test_commit_prove_verify_roundtrip():
    b = _commit_circuit()
    cs = b.compile()
    x, pub = 3, 11
    pk, vk, y = _solve_y(cs, x, pub)
    proof = groth16.prove(
        cs, pk, {"x": x, "pub": pub, "y": y}, rng=_rng(9)
    )
    assert len(proof.commitments) == 1 and proof.commitment_pok is not None
    assert groth16.verify(proof, vk, [pub, y])


def test_commit_tampered_commitment_fails():
    from tpusnark.curves.ref import G1

    b = _commit_circuit()
    cs = b.compile()
    x, pub = 5, 2
    pk, vk, y = _solve_y(cs, x, pub)
    proof = groth16.prove(cs, pk, {"x": x, "pub": pub, "y": y}, rng=_rng(9))
    proof.commitments[0] = G1.mul(G1.generator(), 1234567)
    with pytest.raises(groth16.InvalidProofError):
        groth16.verify(proof, vk, [pub, y])


def test_commit_placeholder_y_rejected_by_prover():
    """A witness built from the PLACEHOLDER challenge (solver-only flow,
    no prover override) must not survive the real prover: the overridden
    hint yields a different challenge, so the circuit's y-equation fails."""
    from tpusnark.constraint.hints import bsb22_placeholder
    from tpusnark.constraint.solver import UnsatisfiedConstraintError

    b = _commit_circuit()
    cs = b.compile()
    x, pub = 3, 11
    pk, vk, y_real = _solve_y(cs, x, pub)
    c = bsb22_placeholder(P, [0, pub % P, x % P])[0]
    y_placeholder = (pow(x, 3, P) + c * x + 5 + pub) % P
    assert y_placeholder != y_real
    with pytest.raises(UnsatisfiedConstraintError):
        groth16.prove(cs, pk, {"x": x, "pub": pub, "y": y_placeholder}, rng=_rng(9))


def test_commit_key_serialization_roundtrip():
    """pk/vk bytes for a commitment circuit must carry the Pedersen keys and
    committed-index lists (reference marshal.go:104-117,255-290); restored
    keys must prove AND verify (round 2 silently dropped them)."""
    from tpusnark.backend.groth16.marshal import (
        pk_from_bytes,
        pk_to_bytes,
        vk_from_bytes,
        vk_to_bytes,
    )

    b = _commit_circuit()
    cs = b.compile()
    x, pub = 4, 9
    pk, vk, y = _solve_y(cs, x, pub)

    vk2 = vk_from_bytes(vk_to_bytes(vk))
    assert vk2.commitment_key is not None
    assert vk2.commitment_key.g2 == vk.commitment_key.g2
    assert vk2.commitment_key.g2_sigma_neg == vk.commitment_key.g2_sigma_neg
    assert vk2.public_and_commitment_committed == vk.public_and_commitment_committed

    pk2 = pk_from_bytes(pk_to_bytes(pk))
    assert len(pk2.commitment_keys) == 1
    assert pk2.commitment_keys[0].basis == pk.commitment_keys[0].basis
    assert pk2.commitment_keys[0].basis_exp_sigma == pk.commitment_keys[0].basis_exp_sigma

    # restored keys prove + verify end-to-end
    proof = groth16.prove(cs, pk2, {"x": x, "pub": pub, "y": y}, rng=_rng(9))
    assert groth16.verify(proof, vk2, [pub, y])
