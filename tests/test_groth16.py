"""End-to-end Groth16 on BN254: the minimum end-to-end slice (SURVEY.md §7).

Mirrors the reference's tiered CheckCircuit flow
(/root/reference/test/assert_checkcircuit.go:30-152): compile -> solve ->
setup -> prove -> verify, plus invalid-witness and invalid-proof negatives.
"""

import random

import pytest

from tpusnark.backend import groth16
from tpusnark.constraint.solver import UnsatisfiedConstraintError, solve
from tpusnark.curves import ref
from tpusnark.frontend.builder import Builder


def cubic_circuit():
    """x**3 + x + 5 == y (the reference hello-world, examples/cubic/cubic.go)."""
    b = Builder(ref.R)
    x = b.secret("x")
    y = b.public("y")
    x3 = b.mul(x, x, x)
    b.assert_is_equal(b.add(x3, x, 5), y)
    return b.compile()


@pytest.fixture(scope="module")
def cubic_keys():
    cs = cubic_circuit()
    rng = random.Random(42)
    pk, vk = groth16.setup(cs, rng=lambda: rng.randrange(1, ref.R), use_device=False)
    return cs, pk, vk


def test_groth16_cubic_roundtrip(cubic_keys):
    cs, pk, vk = cubic_keys
    proof = groth16.prove(cs, pk, {"x": 3, "y": 35})
    assert groth16.verify(proof, vk, [35])


def test_groth16_cubic_wrong_public_fails(cubic_keys):
    cs, pk, vk = cubic_keys
    proof = groth16.prove(cs, pk, {"x": 3, "y": 35})
    assert not groth16.verify(proof, vk, [36])


def test_groth16_invalid_witness_unsolvable(cubic_keys):
    cs, pk, vk = cubic_keys
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, {"x": 3, "y": 36})


def test_groth16_tampered_proof_fails(cubic_keys):
    cs, pk, vk = cubic_keys
    proof = groth16.prove(cs, pk, {"x": 3, "y": 35})
    bad = groth16.Proof(ar=ref.G1.double(proof.ar), krs=proof.krs, bs=proof.bs)
    assert not groth16.verify(bad, vk, [35])


@pytest.mark.slow
def test_groth16_bigger_circuit_with_hints():
    """Exercises hints (is_zero), booleans, select through the full pipeline."""
    b = Builder(ref.R)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for _ in range(6):
        acc = b.mul(acc, acc)  # x^(2^6)
    z = b.is_zero(b.sub(acc, y))
    b.assert_is_equal(z, 1)
    cs = b.compile()

    rng = random.Random(7)
    pk, vk = groth16.setup(cs, rng=lambda: rng.randrange(1, ref.R), use_device=False)
    xval = 12345
    yval = pow(xval, 64, ref.R)
    proof = groth16.prove(cs, pk, {"x": xval, "y": yval})
    assert groth16.verify(proof, vk, [yval])
    assert not groth16.verify(proof, vk, [yval + 1])
