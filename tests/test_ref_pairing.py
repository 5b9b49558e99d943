"""Reference (pure-Python) BN254 curve + pairing sanity tests.

These validate the oracle itself: group laws, subgroup orders, pairing
bilinearity and non-degeneracy — the properties the reference's verifier
relies on (/root/reference/backend/groth16/bn254/verify.go:43-141).
"""

import random

import pytest

from tpusnark.curves import ref
from tpusnark.curves.ref import G1, G2, Fp2, Fp12, P, R, pairing, pairing_check

rng = random.Random(42)


def test_g1_group_law():
    g = G1.generator()
    assert G1.on_curve(g)
    g2 = G1.double(g)
    assert G1.on_curve(g2)
    assert G1.add(g, g) == g2
    assert G1.add(g2, G1.neg(g)) == g
    # order r
    assert G1.mul(g, R) is None
    assert G1.mul(g, R + 5) == G1.mul(g, 5)
    # associativity spot check
    a, b = G1.mul(g, 1234567), G1.mul(g, 7654321)
    assert G1.add(a, b) == G1.mul(g, 1234567 + 7654321)


def test_g2_group_law():
    g = G2.generator()
    assert G2.on_curve(g)
    assert G2.on_curve(G2.double(g))
    assert G2.mul(g, R) is None
    a, b = G2.mul(g, 999), G2.mul(g, 1001)
    assert G2.add(a, b) == G2.mul(g, 2000)


def test_fp12_tower():
    # (x * x^-1) == 1 and Frobenius consistency: x^(p^12) == x
    x = Fp12(
        ref.Fp6(Fp2(3, 7), Fp2(1, 2), Fp2(5, 11)),
        ref.Fp6(Fp2(8, 9), Fp2(0, 4), Fp2(6, 1)),
    )
    assert (x * x.inv()).is_one()
    y = x
    for _ in range(12):
        y = y.pow(P)
    assert y == x


@pytest.mark.slow
def test_pairing_bilinear():
    g1, g2 = G1.generator(), G2.generator()
    e = pairing(g1, g2)
    assert not e.is_one()  # non-degenerate
    # e(aP, bQ) == e(P, Q)^(ab)
    a, b = 17, 23
    lhs = pairing(G1.mul(g1, a), G2.mul(g2, b))
    assert lhs == e.pow(a * b)
    # e(P, Q)^r == 1
    assert e.pow(R).is_one()


@pytest.mark.slow
def test_pairing_check_product():
    g1, g2 = G1.generator(), G2.generator()
    # e(aP, Q) * e(-P, aQ) == 1
    a = 31337
    assert pairing_check([(G1.mul(g1, a), g2), (G1.neg(g1), G2.mul(g2, a))])
    assert not pairing_check([(G1.mul(g1, a), g2), (G1.neg(g1), G2.mul(g2, a + 1))])
