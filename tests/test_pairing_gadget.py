"""In-circuit pairing gadget vs the host optimal-ate oracle (curves/ref.py).

Reference parity: /root/reference/std/algebra/emulated/sw_bn254/pairing.go
(MillerLoop / FinalExponentiation / PairingCheck), validated through the
big-int test engine like gnark's own std tests."""

import os

import pytest

from tpusnark.curves.ref import G1, G2, final_exp, miller_loop
from tpusnark.fields.spec import BN254_FR
from tpusnark.gadgets.pairing import PairingGadget
from tpusnark.testing.engine import TestEngine

SLOW = bool(os.environ.get("TPUSNARK_SLOW_TESTS"))


@pytest.fixture()
def pg():
    return PairingGadget(TestEngine(BN254_FR.modulus, {}))


def _points():
    p = G1.mul(G1.generator(), 7)
    q = G2.mul(G2.generator(), 11)
    return p, q


def test_miller_loop_vs_host(pg):
    p, q = _points()
    want = miller_loop(p, q)
    P = pg.g1_point(*p)
    Q = pg.g2_point(*q)
    got = pg.e12_value(pg.miller_loop(P, Q))
    assert got == want


def test_twist_frobenius_points(pg):
    """pi / -pi^2 in twist coordinates land on the twist curve (sanity on
    the line-correction endpoints)."""
    _, q = _points()
    Q = pg.g2_point(*q)
    for QQ in (pg._twist_frob(Q), pg._twist_frob2_neg(Q)):
        x, y = pg.e2_value(QQ.x), pg.e2_value(QQ.y)
        assert G2.on_curve((x, y))


@pytest.mark.slow
def test_final_exp_and_pairing_check(pg):
    p, q = _points()
    m = miller_loop(p, q)
    want = final_exp(m)
    got = pg.e12_value(pg.final_exp(pg.e12_from_host(m)))
    assert got == want
    # e(P, Q) * e(-P, Q) == 1
    P = pg.g1_point(*p)
    Pn = pg.g1_point(*G1.neg(p))
    Q = pg.g2_point(*q)
    pg.pairing_check([(P, Q), (Pn, Q)])


@pytest.mark.slow
def test_pairing_bilinearity_in_circuit(pg):
    """e(aG1, Q) == e(G1, aQ) checked as e(aG1,Q) * e(-G1, aQ) == 1."""
    a = 5
    p1 = G1.mul(G1.generator(), a)
    q1 = G2.generator()
    p2 = G1.neg(G1.generator())
    q2 = G2.mul(G2.generator(), a)
    pg.pairing_check(
        [(pg.g1_point(*p1), pg.g2_point(*q1)), (pg.g1_point(*p2), pg.g2_point(*q2))]
    )
