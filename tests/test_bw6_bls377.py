"""The native 2-chain: BLS12-377 (inner) + BW6-761 (outer).

Reference parity: curve list /root/reference/backend/backend.go:28-33;
the 2-chain property (r_BW6 == p_BLS377) underlies std/algebra/native —
BLS12-377 point coordinates are native field elements in BW6-761 circuits.

Covers: parameter derivation checks (trace/cofactor/twist verified from
first principles), host pairing bilinearity, and end-to-end Groth16
prove/verify through the ONE parametrized prover on both curves — the
no-codegen claim extended to a 24-limb and a 48-limb base field, and to a
G2-over-Fp (sextic twist) curve shape the BLS curves don't exercise.
"""

import random

import pytest

from tpusnark.backend.groth16.prove import prove
from tpusnark.backend.groth16.setup import setup
from tpusnark.backend.groth16.verify import verify
from tpusnark.curves import bls12377, bw6761
from tpusnark.fields.spec import BLS12_377_FR, BW6_761_FR
from tpusnark.frontend.builder import Builder


def _cubic(r):
    b = Builder(r)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    return b.compile()


def _rng(seed, r):
    st = random.Random(seed)
    return lambda: st.randrange(1, r)


# ------------------------------------------------------------- parameters
def test_two_chain_property():
    """r_BW6 == p_BLS377: the defining property of the 2-chain."""
    assert bw6761.R == bls12377.P
    assert BW6_761_FR.modulus == bls12377.P


def test_bls377_derivation():
    x = 0x8508C00000000001
    assert bls12377.R == x**4 - x**2 + 1
    assert bls12377.P == (x - 1) ** 2 * bls12377.R // 3 + x
    # -5 is a QNR (Fp2 = Fp[u]/(u^2+5) is a field)
    p = bls12377.P
    assert pow(p - 5, (p - 1) // 2, p) == p - 1
    g = bls12377.G1.generator()
    assert bls12377.G1.is_on_curve(g) and bls12377.G1.in_subgroup(g)
    q = bls12377.G2.generator()
    assert bls12377.G2.is_on_curve(q) and bls12377.G2.in_subgroup(q)


def test_bw6761_derivation():
    p, r, t = bw6761.P, bw6761.R, bw6761.TRACE
    assert (p + 1 - t) % r == 0  # r | #E(Fp)
    assert t * t <= 4 * p  # Hasse
    g = bw6761.G1.generator()
    assert bw6761.G1.is_on_curve(g) and bw6761.G1.in_subgroup(g)
    q = bw6761.G2.generator()
    assert bw6761.G2.is_on_curve(q) and bw6761.G2.in_subgroup(q)


@pytest.mark.slow
def test_bls377_pairing_bilinear():
    rng = random.Random(5)
    c = bls12377
    a, b = rng.randrange(1, c.R), rng.randrange(1, c.R)
    g1, g2 = c.G1.generator(), c.G2.generator()
    e1 = c.pairing(c.G1.mul(g1, a), c.G2.mul(g2, b))
    e2 = c.pairing(g1, g2).pow(a * b % c.R)
    assert e1 == e2
    assert not c.pairing(g1, g2).is_one()


@pytest.mark.slow
def test_bw6761_pairing_bilinear():
    rng = random.Random(5)
    c = bw6761
    a, b = rng.randrange(1, c.R), rng.randrange(1, c.R)
    g1, g2 = c.G1.generator(), c.G2.generator()
    e1 = c.pairing(c.G1.mul(g1, a), c.G2.mul(g2, b))
    e2 = c.pairing(g1, g2).pow(a * b % c.R)
    assert e1 == e2
    assert not c.pairing(g1, g2).is_one()


# --------------------------------------------------------------- Groth16
def test_bls377_groth16_prove_verify():
    r = BLS12_377_FR.modulus
    cs = _cubic(r)
    pk, vk = setup(cs, rng=_rng(3, r), curve="bls12-377", use_device=False)
    assert pk.curve == "bls12-377"
    proof = prove(cs, pk, {"x": 3, "y": 35}, rng=_rng(5, r))
    assert verify(proof, vk, [35], curve="bls12-377")
    assert not verify(proof, vk, [36], curve="bls12-377")


@pytest.mark.slow
def test_bw6761_groth16_prove_verify():
    """48-limb base field + G2-over-Fp through the one parametrized
    prover: the largest field the device kernels have ever run."""
    r = BW6_761_FR.modulus
    cs = _cubic(r)
    pk, vk = setup(cs, rng=_rng(3, r), curve="bw6-761", use_device=False)
    proof = prove(cs, pk, {"x": 3, "y": 35}, rng=_rng(5, r))
    assert verify(proof, vk, [35], curve="bw6-761")
    assert not verify(proof, vk, [36], curve="bw6-761")
