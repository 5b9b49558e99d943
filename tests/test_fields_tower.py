"""In-circuit Fp2/Fp6/Fp12 tower vs the host oracle (curves/ref.py).

Reference parity: /root/reference/std/algebra/emulated/fields_bn254/
(e2.go/e6.go/e12.go Mul/Square/Inverse/Frobenius)."""

import random

import pytest

from tpusnark.curves.ref import P as BN_P
from tpusnark.curves.ref import Fp2, Fp6, Fp12, _frob12
from tpusnark.fields.spec import BN254_FR
from tpusnark.gadgets.fields_tower import Fp12Tower
from tpusnark.testing.engine import TestEngine

rng = random.Random(21)


def _rand_fp2():
    return Fp2(rng.randrange(BN_P), rng.randrange(BN_P))


def _rand_fp12():
    return Fp12(
        Fp6(_rand_fp2(), _rand_fp2(), _rand_fp2()),
        Fp6(_rand_fp2(), _rand_fp2(), _rand_fp2()),
    )


@pytest.fixture()
def tower():
    api = TestEngine(BN254_FR.modulus, {})
    return Fp12Tower(api)


def test_e2_ops_vs_host(tower):
    a, b = _rand_fp2(), _rand_fp2()
    ea, eb = tower.e2_from_host(a), tower.e2_from_host(b)
    assert tower.e2_value(tower.e2_mul(ea, eb)) == a * b
    assert tower.e2_value(tower.e2_square(ea)) == a.square()
    assert tower.e2_value(tower.e2_add(ea, eb)) == a + b
    assert tower.e2_value(tower.e2_sub(ea, eb)) == a - b
    assert tower.e2_value(tower.e2_mul_xi(ea)) == a.mul_xi()
    assert tower.e2_value(tower.e2_inv(ea)) == a.inv()
    tower.e2_assert_eq(tower.e2_mul(ea, tower.e2_inv(ea)), tower.e2(1, 0))


def test_e6_mul_inv_vs_host(tower):
    a = Fp6(_rand_fp2(), _rand_fp2(), _rand_fp2())
    b = Fp6(_rand_fp2(), _rand_fp2(), _rand_fp2())
    ea = tower.e6(*(tower.e2_from_host(c) for c in (a.c0, a.c1, a.c2)))
    eb = tower.e6(*(tower.e2_from_host(c) for c in (b.c0, b.c1, b.c2)))
    prod = tower.e6_mul(ea, eb)
    want = a * b
    got = [tower.e2_value(c) for c in (prod.c0, prod.c1, prod.c2)]
    assert got == [want.c0, want.c1, want.c2]
    inv = tower.e6_inv(ea)
    winv = a.inv()
    assert [tower.e2_value(c) for c in (inv.c0, inv.c1, inv.c2)] == [
        winv.c0,
        winv.c1,
        winv.c2,
    ]


def test_e12_mul_square_inv_conj_vs_host(tower):
    a, b = _rand_fp12(), _rand_fp12()
    ea, eb = tower.e12_from_host(a), tower.e12_from_host(b)
    assert tower.e12_value(tower.e12_mul(ea, eb)) == a * b
    assert tower.e12_value(tower.e12_square(ea)) == a.square()
    assert tower.e12_value(tower.e12_conj(ea)) == a.conj()
    assert tower.e12_value(tower.e12_inv(ea)) == a.inv()
    tower.e12_assert_eq(
        tower.e12_mul(ea, tower.e12_inv(ea)), tower.e12_one()
    )


def test_e12_frobenius_vs_host(tower):
    a = _rand_fp12()
    ea = tower.e12_from_host(a)
    assert tower.e12_value(tower.e12_frobenius(ea)) == _frob12(a)
    assert tower.e12_value(tower.e12_frobenius_square(ea)) == _frob12(_frob12(a))


def test_e2_mul_compiled_r1cs():
    """One e2 mul through the real R1CS builder + solver (not the engine)."""
    from tpusnark.constraint.solver import solve
    from tpusnark.frontend.builder import Builder

    a, b = _rand_fp2(), _rand_fp2()
    want = a * b
    bld = Builder(BN254_FR.modulus)
    t = Fp12Tower(bld)
    ea, eb = t.e2_from_host(a), t.e2_from_host(b)
    prod = t.e2_mul(ea, eb)
    t.e2_assert_eq(prod, t.e2_from_host(want))
    cs = bld.compile()
    solve(cs, {})  # all constants+hints; must be satisfiable
    # and the product constraint actually binds: a wrong expectation fails
    bld2 = Builder(BN254_FR.modulus)
    t2 = Fp12Tower(bld2)
    p2 = t2.e2_mul(t2.e2_from_host(a), t2.e2_from_host(b))
    t2.e2_assert_eq(p2, t2.e2_from_host(want + Fp2(1, 0)))
    with pytest.raises(Exception):
        solve(bld2.compile(), {})
