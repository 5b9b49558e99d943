"""NTT tests vs the Python-int oracle (Domain.ntt_ref).

Reference parity surface: gnark-crypto fft.Domain FFT/FFTInverse/OnCoset
(SURVEY.md §2.5; consumed at backend/groth16/bn254/prove.go:353-396).
"""

import random

import pytest

from tpusnark.fields.spec import BN254_FR
from tpusnark.poly.domain import Domain
from tpusnark.poly.ntt import NTT

rng = random.Random(99)


@pytest.mark.parametrize("n", [1, 2, 8, 64, 256])
def test_ntt_matches_oracle(n):
    ntt = NTT(BN254_FR, n)
    p = BN254_FR.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    x = ntt.field.array(coeffs)
    got = ntt.field.to_ints(ntt.ntt(x))
    want = ntt.domain.ntt_ref(coeffs)
    assert got == want


@pytest.mark.parametrize("n", [8, 128])
def test_intt_roundtrip(n):
    ntt = NTT(BN254_FR, n)
    p = BN254_FR.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    x = ntt.field.array(coeffs)
    back = ntt.field.to_ints(ntt.intt(ntt.ntt(x)))
    assert back == coeffs
    # oracle cross-check of intt itself
    evals = [rng.randrange(p) for _ in range(n)]
    got = ntt.field.to_ints(ntt.intt(ntt.field.array(evals)))
    assert got == ntt.domain.intt_ref(evals)


def test_ntt_is_polynomial_evaluation():
    n = 16
    ntt = NTT(BN254_FR, n)
    p = BN254_FR.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    got = ntt.field.to_ints(ntt.ntt(ntt.field.array(coeffs)))
    w = ntt.domain.generator
    for i in [0, 1, 5, n - 1]:
        x = pow(w, i, p)
        want = sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p
        assert got[i] == want


def test_coset_evaluation():
    n = 32
    ntt = NTT(BN254_FR, n)
    p = BN254_FR.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    x = ntt.field.array(coeffs)
    got = ntt.field.to_ints(ntt.ntt_coset(x))
    w, s = ntt.domain.generator, ntt.domain.coset_shift
    for i in [0, 3, n - 1]:
        pt = s * pow(w, i, p) % p
        want = sum(c * pow(pt, j, p) for j, c in enumerate(coeffs)) % p
        assert got[i] == want
    # roundtrip through the coset
    back = ntt.field.to_ints(ntt.intt_coset(ntt.field.array(got)))
    assert back == coeffs


def test_vanishing_polynomial_on_coset():
    # Z(x) = x^n - 1 is nonzero on the coset: the Groth16 computeH division
    # by Z on the coset (prove.go:353-396) relies on this.
    n = 16
    d = Domain(BN254_FR, n)
    p = BN254_FR.modulus
    s = d.coset_shift
    assert pow(s, n, p) != 1
