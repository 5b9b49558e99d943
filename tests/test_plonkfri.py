"""PlonkFRI backend end-to-end: transparent (no trusted setup) PLONK.

Reference parity: /root/reference/backend/plonkfri/bn254/{setup,prove,
verify}.go + plonkfri_test.go — prove/verify round trip, wrong public input
rejected, tampered proofs rejected.
"""

import pytest

from tpusnark.backend import plonkfri
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.plonk_builder import PlonkBuilder
from tpusnark.poly.fri import FriParams

P = BN254_FR.modulus

FAST = FriParams(blowup=8, n_queries=8, stop_degree=4)


def build_cubic():
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    x3 = b.mul(x, x, x)
    b.assert_is_equal(b.add(x3, x, 5), y)
    return b.compile()


@pytest.fixture(scope="module")
def artifacts():
    cs = build_cubic()
    pk, vk = plonkfri.setup(cs, FAST)
    proof = plonkfri.prove(cs, pk, {"x": 3, "y": 35})
    return cs, pk, vk, proof


def test_plonkfri_roundtrip(artifacts):
    _, _, vk, proof = artifacts
    assert plonkfri.verify(proof, vk, [35])


def test_plonkfri_rejects_wrong_public(artifacts):
    _, _, vk, proof = artifacts
    assert not plonkfri.verify(proof, vk, [36])


def test_plonkfri_rejects_tampered_opening(artifacts):
    import copy

    _, _, vk, proof = artifacts
    bad = copy.deepcopy(proof)
    bad.identity_queries[0].openings["l"].value = (
        bad.identity_queries[0].openings["l"].value + 1
    ) % P
    assert not plonkfri.verify(bad, vk, [35])


def test_plonkfri_rejects_tampered_root(artifacts):
    import copy

    _, _, vk, proof = artifacts
    bad = copy.deepcopy(proof)
    bad.online_roots["z"] = bytes(32)
    assert not plonkfri.verify(bad, vk, [35])


def test_plonkfri_bigger_circuit():
    """A wider circuit with products + public mixing."""
    b = PlonkBuilder(P)
    xs = [b.secret(f"x{i}") for i in range(6)]
    out = b.public("out")
    acc = 1
    for x in xs:
        acc = b.mul(acc, b.add(x, 1))
    b.assert_is_equal(acc, out)
    cs = b.compile()

    vals = [3, 1, 4, 1, 5, 9]
    expected = 1
    for v in vals:
        expected = expected * (v + 1) % P
    assign = {f"x{i}": v for i, v in enumerate(vals)}
    assign["out"] = expected

    pk, vk = plonkfri.setup(cs, FAST)
    proof = plonkfri.prove(cs, pk, assign)
    assert plonkfri.verify(proof, vk, [expected])
    assert not plonkfri.verify(proof, vk, [(expected + 1) % P])
