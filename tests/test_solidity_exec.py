"""Execute the exported Solidity verifiers (the reference's on-chain check
tier, /root/reference/test/assert_solidity.go:52): real proof -> calldata
words -> run verifyProof through the contract interpreter -> success; then
tamper and expect the contract's revert."""

import random

import pytest

from tpusnark.fields.spec import BN254_FR
from tpusnark.testing.solidity_exec import Contract, ContractRevert

P = BN254_FR.modulus


@pytest.fixture(scope="module")
def groth16_artifacts():
    from tpusnark.backend import groth16
    from tpusnark.backend.groth16.solidity import export_solidity
    from tpusnark.frontend.builder import Builder

    b = Builder(P)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    cs = b.compile()
    st = random.Random(21)
    pk, vk = groth16.setup(cs, rng=lambda: st.randrange(1, P), use_device=False)
    proof = groth16.prove(cs, pk, {"x": 3, "y": 35}, rng=lambda: st.randrange(1, P))
    assert groth16.verify(proof, vk, [35])
    return export_solidity(vk), proof


def _g16_calldata(proof):
    ax, ay = proof.ar
    bx, by = proof.bs
    cx, cy = proof.krs
    return [ax, ay, bx.c1, bx.c0, by.c1, by.c0, cx, cy]


def test_groth16_contract_accepts(groth16_artifacts):
    src, proof = groth16_artifacts
    c = Contract(src)
    c.call("verifyProof", _g16_calldata(proof), [35])  # must not revert


def test_groth16_contract_rejects_bad_input(groth16_artifacts):
    src, proof = groth16_artifacts
    c = Contract(src)
    with pytest.raises(ContractRevert):
        c.call("verifyProof", _g16_calldata(proof), [36])


def test_groth16_contract_rejects_tampered_proof(groth16_artifacts):
    src, proof = groth16_artifacts
    c = Contract(src)
    words = _g16_calldata(proof)
    words[0] = (words[0] + 1) % P
    with pytest.raises(ContractRevert):
        c.call("verifyProof", words, [35])


def test_groth16_contract_rejects_oversized_input(groth16_artifacts):
    src, proof = groth16_artifacts
    c = Contract(src)
    with pytest.raises(ContractRevert):
        c.call("verifyProof", _g16_calldata(proof), [35 + P])


# ------------------------------------------------------------------- PLONK
@pytest.fixture(scope="module")
def plonk_artifacts():
    from tpusnark.backend import plonk
    from tpusnark.backend.plonk.solidity import (
        export_solidity,
        proof_to_solidity_calldata,
    )
    from tpusnark.frontend.plonk_builder import PlonkBuilder

    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    cs = b.compile()
    pk, vk = plonk.setup(cs, tau=98765)
    st = random.Random(23)
    proof = plonk.prove(cs, pk, {"x": 3, "y": 35}, rng=lambda: st.randrange(1, P))
    assert plonk.verify(proof, vk, [35])
    return export_solidity(vk), proof_to_solidity_calldata(proof)


@pytest.mark.slow
def test_plonk_contract_accepts(plonk_artifacts):
    src, words = plonk_artifacts
    c = Contract(src)
    c.call("verifyProof", list(words), [35])


@pytest.mark.slow
def test_plonk_contract_rejects_tampered(plonk_artifacts):
    src, words = plonk_artifacts
    c = Contract(src)
    bad = list(words)
    bad[16] = (bad[16] + 1) % P  # claimed l(zeta)
    with pytest.raises(ContractRevert):
        c.call("verifyProof", bad, [35])
    with pytest.raises(ContractRevert):
        c.call("verifyProof", list(words), [34])
