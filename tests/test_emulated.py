"""Emulated (non-native) field arithmetic tests: engine vs big-int oracle,
compiled R1CS solve, soundness negatives.

Reference parity: /root/reference/std/math/emulated/{doc.go,field.go,
field_mul.go} (limb decomposition + quotient-hint identity checking).
Emulates BN254 Fp (the base field) and secp256k1 Fr inside BN254 Fr — the
exact pairing gnark's ECDSA/pairing gadgets need.
"""

import random

import pytest

from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FP, BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.gadgets.emulated import EmuParams, EmulatedField
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus
FP = BN254_FP.modulus
SECP_R = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141

rng = random.Random(11)


@pytest.mark.parametrize("r", [FP, SECP_R], ids=["bn254_fp", "secp256k1_r"])
def test_emulated_ops_engine(r):
    eng = TestEngine(P, {})
    prm = EmuParams.for_modulus(r)
    F = EmulatedField(eng, prm)
    for _ in range(5):
        a_v, b_v = rng.randrange(r), rng.randrange(1, r)
        a = F.from_limbs(prm.decompose(a_v))
        b = F.from_limbs(prm.decompose(b_v))
        assert F.to_value(F.reduce(F.add(a, b))) == (a_v + b_v) % r
        assert F.to_value(F.reduce(F.sub(a, b))) == (a_v - b_v) % r
        assert F.to_value(F.mul(a, b)) == (a_v * b_v) % r
        assert F.to_value(F.inverse(b)) == pow(b_v, r - 2, r)
        assert F.to_value(F.div(a, b)) == a_v * pow(b_v, r - 2, r) % r
        F.assert_is_equal(F.mul(a, b), F.constant(a_v * b_v % r))


def test_emulated_chain_engine():
    """Long unreduced chains exercise overflow tracking + auto-reduce."""
    eng = TestEngine(P, {})
    prm = EmuParams.for_modulus(FP)
    F = EmulatedField(eng, prm)
    acc_v = 1
    acc = F.constant(1)
    for i in range(40):
        v = rng.randrange(FP)
        e = F.constant(v)
        acc = F.add(acc, e) if i % 3 else F.mul(acc, e)
        acc_v = (acc_v + v) % FP if i % 3 else (acc_v * v) % FP
    assert F.to_value(F.reduce(acc)) == acc_v


def test_emulated_is_zero_engine():
    eng = TestEngine(P, {})
    prm = EmuParams.for_modulus(FP)
    F = EmulatedField(eng, prm)
    a = F.from_limbs(prm.decompose(5))
    assert F.is_zero(F.sub(a, F.constant(5))) == 1
    assert F.is_zero(F.sub(a, F.constant(6))) == 0


def _mul_circuit(api, prm):
    F = EmulatedField(api, prm)
    a = F.from_limbs([api.secret(f"a{i}") for i in range(prm.n_limbs)])
    b = F.from_limbs([api.secret(f"b{i}") for i in range(prm.n_limbs)])
    c = F.from_limbs([api.public(f"c{i}") for i in range(prm.n_limbs)])
    F.assert_is_equal(F.mul(a, b), c)


def test_emulated_mul_compiled():
    prm = EmuParams.for_modulus(FP)
    bld = Builder(P)
    _mul_circuit(bld, prm)
    cs = bld.compile()

    a_v, b_v = rng.randrange(FP), rng.randrange(FP)
    c_v = a_v * b_v % FP
    assign = {}
    for name, v in (("a", a_v), ("b", b_v), ("c", c_v)):
        for i, l in enumerate(prm.decompose(v)):
            assign[f"{name}{i}"] = l
    solve(cs, assign)

    bad = dict(assign)
    bad["c0"] = (bad["c0"] + 1) % P
    with pytest.raises(Exception):
        solve(cs, bad)


@pytest.mark.slow
def test_emulated_mul_proved_groth16():
    """Full pipeline over the emulated gadget: setup/prove/verify."""
    from tpusnark.backend import groth16

    prm = EmuParams.for_modulus(SECP_R)
    bld = Builder(P)
    _mul_circuit(bld, prm)
    cs = bld.compile()

    a_v, b_v = rng.randrange(SECP_R), rng.randrange(SECP_R)
    c_v = a_v * b_v % SECP_R
    assign = {}
    for name, v in (("a", a_v), ("b", b_v), ("c", c_v)):
        for i, l in enumerate(prm.decompose(v)):
            assign[f"{name}{i}"] = l
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(cs, pk, assign)
    pub = [assign[f"c{i}"] for i in range(prm.n_limbs)]
    assert groth16.verify(proof, vk, pub)
