"""BLS24-315 / BLS24-317 + BW6-633: the last three of the reference's
seven curves (curve list /root/reference/backend/backend.go:28-33;
generated packages constraint/{bls24-315,bls24-317,bw6-633} and
backend/{groth16,plonk}/<curve>).

Covers: parameter derivation checks (seeds, primality-backed p/r
relations, trace/cofactor/twist orders from the CM equation), host
pairing bilinearity over the generic tower (curves/tower.py), the
BLS24-315 <-> BW6-633 2-chain property, and end-to-end Groth16 through
the ONE parametrized prover — including the first G2-over-Fp4 MSM
(jcurve.Fp4Arith)."""

import random

import pytest

from tpusnark.backend.groth16.prove import prove
from tpusnark.backend.groth16.setup import setup
from tpusnark.backend.groth16.verify import verify
from tpusnark.curves import bls24315, bls24317, bw6633
from tpusnark.fields.spec import (
    BLS24_315_FR,
    BLS24_317_FR,
    BW6_633_FR,
)
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
@pytest.mark.parametrize(
    "mod,x",
    [(bls24315, -0xBFCFFFFF), (bls24317, 0xD9018000)],
    ids=["315", "317"],
)
def test_bls24_derivation(mod, x):
    assert mod.R == x**8 - x**4 + 1
    assert mod.P == (x - 1) ** 2 * mod.R // 3 + x
    # tower sanity: A2 is a non-square (Fp2 is a field)
    p = mod.P
    assert pow(mod.A2 % p, (p - 1) // 2, p) == p - 1
    g = mod.G1.generator()
    assert mod.G1.is_on_curve(g) and mod.G1.in_subgroup(g)
    q = mod.G2.generator()
    assert mod.G2.is_on_curve(q) and mod.G2.in_subgroup(q)


def test_two_chain_bw6633():
    """r_BW6-633 == p_BLS24-315: the 2-chain property."""
    assert bw6633.R == bls24315.P
    assert BW6_633_FR.modulus == bls24315.P


def test_bw6633_derivation():
    p, r, t = bw6633.P, bw6633.R, bw6633.TRACE
    assert (p + 1 - t) % r == 0  # r | #E(Fp)
    assert t * t <= 4 * p  # Hasse
    assert bw6633.N2 % r == 0  # r | #E'(Fp) (twist)
    g = bw6633.G1.generator()
    assert bw6633.G1.is_on_curve(g) and bw6633.G1.in_subgroup(g)
    q = bw6633.G2.generator()
    assert bw6633.G2.is_on_curve(q) and bw6633.G2.in_subgroup(q)


@pytest.mark.parametrize(
    "mod", [bls24315, bls24317, bw6633], ids=["315", "317", "633"]
)
@pytest.mark.slow
def test_pairing_bilinear(mod):
    rng = random.Random(5)
    a, b = rng.randrange(1, mod.R), rng.randrange(1, mod.R)
    g1, g2 = mod.G1.generator(), mod.G2.generator()
    e1 = mod.pairing(mod.G1.mul(g1, a), mod.G2.mul(g2, b))
    e2 = mod.pairing(g1, g2).pow(a * b % mod.R)
    assert e1 == e2
    assert not mod.pairing(g1, g2).is_one()


# --------------------------------------------------------------- Groth16
@pytest.mark.slow
def test_bls24315_groth16_prove_verify():
    """First G2-over-Fp4 device MSM (Fp4Arith tower kernels)."""
    r = BLS24_315_FR.modulus
    cs = _cubic(r)
    pk, vk = setup(cs, rng=_rng(3, r), curve="bls24-315", use_device=False)
    assert pk.curve == "bls24-315"
    proof = prove(cs, pk, {"x": 3, "y": 35}, rng=_rng(5, r))
    assert verify(proof, vk, [35], curve="bls24-315")
    assert not verify(proof, vk, [36], curve="bls24-315")


@pytest.mark.slow
def test_bls24317_groth16_prove_verify():
    r = BLS24_317_FR.modulus
    cs = _cubic(r)
    pk, vk = setup(cs, rng=_rng(3, r), curve="bls24-317", use_device=False)
    proof = prove(cs, pk, {"x": 3, "y": 35}, rng=_rng(5, r))
    assert verify(proof, vk, [35], curve="bls24-317")
    assert not verify(proof, vk, [36], curve="bls24-317")


@pytest.mark.slow
def test_bw6633_groth16_prove_verify():
    r = BW6_633_FR.modulus
    cs = _cubic(r)
    pk, vk = setup(cs, rng=_rng(3, r), curve="bw6-633", use_device=False)
    proof = prove(cs, pk, {"x": 3, "y": 35}, rng=_rng(5, r))
    assert verify(proof, vk, [35], curve="bw6-633")
    assert not verify(proof, vk, [36], curve="bw6-633")
