"""In-circuit PLONK recursion verifier (std/recursion/plonk analog,
/root/reference/std/recursion/plonk/verifier.go).

Flow: prove a small inner PLONK circuit with the recursion-friendly MiMC
transcript hashes (gnark's WithProverChallengeHashFunction(mimc)
discipline), check the host verifier accepts it under the same hashes, then
verify the SAME proof inside an outer circuit via the TestEngine — and
reject a tampered one."""

import random

import pytest

from tpusnark.backend import plonk
from tpusnark.backend.config import ProverConfig, VerifierConfig
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.plonk_builder import PlonkBuilder
from tpusnark.gadgets.recursion_plonk import PlonkRecursionVerifier
from tpusnark.testing.engine import TestEngine
from tpusnark.utils.mimc_transcript import MiMCFrHash

P = BN254_FR.modulus


@pytest.fixture(scope="module")
def inner():
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    cs = b.compile()
    pk, vk = plonk.setup(cs, tau=424242)
    st = random.Random(9)
    cfg = (
        ProverConfig()
        .with_rng(lambda: st.randrange(1, P))
        .with_challenge_hash(MiMCFrHash)
        .with_kzg_fold_hash(MiMCFrHash)
    )
    proof = plonk.prove(cs, pk, {"x": 3, "y": 35}, config=cfg)
    return proof, vk


def test_host_verify_with_mimc_hashes(inner):
    proof, vk = inner
    vcfg = (
        VerifierConfig()
        .with_challenge_hash(MiMCFrHash)
        .with_kzg_fold_hash(MiMCFrHash)
    )
    assert plonk.verify(proof, vk, [35], config=vcfg)
    # hash mismatch (default SHA-256 verifier) must reject
    assert not plonk.verify(proof, vk, [35])


@pytest.mark.slow
def test_plonk_proof_verifies_in_circuit(inner):
    proof, vk = inner
    eng = TestEngine(P, {"y": 35})
    v = PlonkRecursionVerifier(eng, vk)
    pv = v.proof_from_host(proof)
    v.assert_proof(pv, [eng.public("y")])  # must not raise


@pytest.mark.slow
def test_tampered_plonk_proof_rejected(inner):
    proof, vk = inner
    import dataclasses

    bad = dataclasses.replace(
        proof,
        claimed_values=[(proof.claimed_values[0] + 1) % P]
        + list(proof.claimed_values[1:]),
    )
    eng = TestEngine(P, {"y": 35})
    v = PlonkRecursionVerifier(eng, vk)
    pv = v.proof_from_host(bad)
    with pytest.raises(Exception):
        v.assert_proof(pv, [eng.public("y")])
