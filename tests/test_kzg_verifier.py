"""In-circuit KZG opening verifier vs host openings (std/commitments/kzg
analog, /root/reference/std/commitments/kzg/verifier.go)."""

import random

import pytest

from tpusnark.curves.ref import G1
from tpusnark.fields.spec import BN254_FR
from tpusnark.gadgets.kzg_verifier import KZGVerifier
from tpusnark.poly import kzg
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus
rng = random.Random(31)


@pytest.fixture(scope="module")
def opening():
    srs = kzg.new_srs_unsafe(16, tau=123457, use_device=False)
    coeffs = [rng.randrange(P) for _ in range(8)]
    C = kzg.commit_ints(srs, coeffs)
    z = rng.randrange(2, P)
    y, proof = kzg.open_ints(srs, coeffs, z)
    assert kzg.verify_opening(srs, C, z, y, proof)
    return srs, C, z, y, proof


def test_g1_combination_matches_host(opening):
    """Fast tier: the in-circuit lhs = C - y*G + z*H equals the host's."""
    srs, C, z, y, proof = opening
    api = TestEngine(P, {"z": z, "y": y})
    v = KZGVerifier(api)
    curve, F = v.curve, v.pg.F
    nbits = P.bit_length()
    yG = curve.scalar_mul(curve.generator(), api.to_binary(api.public("y"), nbits))
    zH = curve.scalar_mul(
        curve.constant_point(*proof), api.to_binary(api.public("z"), nbits)
    )
    lhs = curve.add_unsafe(
        curve.add_unsafe(curve.constant_point(*C), curve.neg(yG)), zH
    )
    want = G1.add(G1.add(C, G1.neg(G1.mul(G1.generator(), y))), G1.mul(proof, z))
    assert (F.to_value(lhs.x), F.to_value(lhs.y)) == want


@pytest.mark.slow
def test_opening_verifies_in_circuit(opening):
    srs, C, z, y, proof = opening
    api = TestEngine(P, {"z": z, "y": y})
    v = KZGVerifier(api)
    v.assert_opening(
        srs.g2, v.g1_var(C), api.public("z"), api.public("y"), v.g1_var(proof)
    )


@pytest.mark.slow
def test_wrong_value_rejected(opening):
    srs, C, z, y, proof = opening
    api = TestEngine(P, {"z": z, "y": (y + 1) % P})
    v = KZGVerifier(api)
    with pytest.raises(AssertionError):
        v.assert_opening(
            srs.g2, v.g1_var(C), api.public("z"), api.public("y"), v.g1_var(proof)
        )
