"""PLONK BSB22 commitments: SCS Commit -> qcp trace column -> proof sections.

Reference behavior: frontend/cs/scs/api.go:623 (Commit), setup.go:90-107
(qcp columns), prove.go:316-352 (bsb22Hint: committed poly + blinding +
hash-to-field challenge), verify.go:127-155,237-243 (PI completion and
linearization-commitment reconstruction).

The circuit uses the challenge the way BSB22 is meant to be used — as a
verifier-random value valid for ANY outcome: it asserts x != c (holds with
overwhelming probability) and squares (x - c), so c flows through gates,
the quotient, and the linearization.
"""

import pytest

from tpusnark.backend import plonk
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.plonk_builder import PlonkBuilder

P = BN254_FR.modulus


def _commit_circuit():
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.mul(x, x), y)
    c = b.commit(x)
    b.assert_is_different(x, c)  # inverse gate on (x - c): c-dependent solve
    d = b.mul(b.sub(x, c), b.sub(x, c))
    b.assert_is_equal(d, b.add(b.mul(x, x), b.mul(b._scale(c, P - 2), x), b.mul(c, c)))
    return b.compile()


def _rng(seed):
    import random

    st = random.Random(seed)
    return lambda: st.randrange(1, P)


def test_commit_metadata_and_qcp():
    cs = _commit_circuit()
    assert len(cs.commitments) == 1
    cm = cs.commitments[0]
    assert len(cm.committed) == 1
    # the commitment row comes after the committed row
    assert cm.commitment_index > cm.committed[0]
    pk, vk = plonk.setup(cs)
    assert len(vk.qcp) == 1
    assert list(vk.commitment_constraint_indexes) == [cm.commitment_index]
    assert len(pk.qcp_coeffs) == 1


@pytest.fixture(scope="module")
def artifacts():
    cs = _commit_circuit()
    pk, vk = plonk.setup(cs)
    proof = plonk.prove(cs, pk, {"x": 3, "y": 9}, rng=_rng(5))
    return cs, pk, vk, proof


@pytest.mark.slow
def test_plonk_commit_e2e(artifacts):
    _, _, vk, proof = artifacts
    assert len(proof.bsb22_commitments) == 1
    assert len(proof.claimed_values) == 8  # 7 + one qcp opening
    assert plonk.verify(proof, vk, [9])


@pytest.mark.slow
def test_plonk_commit_tampered_commitment_fails(artifacts):
    import dataclasses

    from tpusnark.curves.ref import G1

    _, _, vk, proof = artifacts
    bad = dataclasses.replace(
        proof, bsb22_commitments=[G1.mul(G1.generator(), 987654321)]
    )
    assert not plonk.verify(bad, vk, [9])


@pytest.mark.slow
def test_plonk_commit_marshal_roundtrip(artifacts):
    from tpusnark.backend.plonk.marshal import proof_from_bytes, proof_to_bytes

    _, _, vk, proof = artifacts
    p2 = proof_from_bytes(proof_to_bytes(proof))
    assert len(p2.bsb22_commitments) == 1
    assert plonk.verify(p2, vk, [9])


def test_solver_skips_commitment_rows():
    """Host solve must not reject the commitment/committed rows (their gate
    equations are balanced by qcp/completed-qk, absent at solver level)."""
    from tpusnark.constraint.scs import solve_scs

    cs = _commit_circuit()
    W = solve_scs(cs, {"x": 3, "y": 9})
    assert W[0] == 9  # public wire
