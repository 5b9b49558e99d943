"""iop Polynomial abstraction: basis/layout conversions vs the host oracle.

Mirrors the conventions gnark-crypto's iop package is used under in
/root/reference/backend/plonk/bn254/prove.go:1000-1017 (ToCanonical ->
coset scale -> ToLagrange round-trips, lazy Shift, bit-reversed layouts).
"""

import random

import pytest

from tpusnark.fields.spec import BN254_FR
from tpusnark.poly.domain import Domain, bit_reverse_perm
from tpusnark.poly.iop import Basis, Layout, Polynomial

P = BN254_FR.modulus
N = 32


@pytest.fixture(scope="module")
def coeffs():
    rng = random.Random(7)
    return [rng.randrange(P) for _ in range(N)]


def test_canonical_lagrange_roundtrip(coeffs):
    dom = Domain(BN254_FR, N)
    p = Polynomial.from_ints(coeffs, BN254_FR)
    lag = p.to_lagrange()
    assert lag.basis is Basis.LAGRANGE
    assert lag.to_ints() == dom.ntt_ref(coeffs)
    back = lag.to_canonical()
    assert back.to_ints() == coeffs


def test_lagrange_coset_roundtrip(coeffs):
    p = Polynomial.from_ints(coeffs, BN254_FR)
    cos = p.to_lagrange_coset()
    assert cos.basis is Basis.LAGRANGE_COSET
    # evaluations on shift*<w> match a host Horner at each coset point
    dom = Domain(BN254_FR, N)
    shift = dom.coset_shift
    evs = cos.to_ints()
    for i in [0, 1, 5, N - 1]:
        x = shift * dom.powers[i] % P
        assert evs[i] == _horner(coeffs, x)
    assert cos.to_canonical().to_ints() == coeffs


def _horner(cs, x):
    acc = 0
    for c in reversed(cs):
        acc = (acc * x + c) % P
    return acc


def test_layout_roundtrip(coeffs):
    p = Polynomial.from_ints(coeffs, BN254_FR).to_lagrange()
    br = p.to_bit_reverse()
    assert br.layout is Layout.BIT_REVERSE
    perm = bit_reverse_perm(N)
    regular = p.to_ints()
    assert br.to_ints() == [regular[j] for j in perm]
    assert br.to_regular().to_ints() == regular


def test_lazy_shift(coeffs):
    dom = Domain(BN254_FR, N)
    p = Polynomial.from_ints(coeffs, BN254_FR).to_lagrange()
    s = p.shift(3)
    assert s.shift_k == 3  # lazy: no data movement yet
    evs = s.to_ints()
    for i in [0, 2, N - 1]:
        assert evs[i] == _horner(coeffs, dom.powers[(i + 3) % N])
    # shifts compose; conversion through canonical resolves them
    assert s.shift(N - 3).to_ints() == p.to_ints()
    # q(x) = p(w^3 x), so q(1) = p(w^3)
    assert s.to_canonical().evaluate(1) == _horner(coeffs, dom.powers[3])


def test_pointwise_ops(coeffs):
    rng = random.Random(8)
    other = [rng.randrange(P) for _ in range(N)]
    a = Polynomial.from_ints(coeffs, BN254_FR).to_lagrange()
    b = Polynomial.from_ints(other, BN254_FR).to_lagrange()
    prod = a.mul(b)
    dom = Domain(BN254_FR, N)
    for i in [0, 7]:
        x = dom.powers[i]
        assert prod.to_ints()[i] == _horner(coeffs, x) * _horner(other, x) % P
    tot = a.add(b).sub(b)
    assert tot.to_ints() == a.to_ints()
    assert a.scale(5).to_ints() == [v * 5 % P for v in a.to_ints()]


def test_mixed_layout_alignment(coeffs):
    a = Polynomial.from_ints(coeffs, BN254_FR).to_lagrange()
    b = a.to_bit_reverse()
    # aligned automatically: a + b == 2a regardless of layouts
    assert a.add(b).to_ints() == a.scale(2).to_ints()
