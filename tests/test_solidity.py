"""Solidity verifier export (reference ExportSolidity, verify.go:147):
generate the contract, parse the embedded vk constants back out, and execute
the contract's exact algorithm (negate A, K-MSM over the calldata inputs,
4-term pairing product) with the host curve as the EVM-precompile stand-in
(no solc in this image)."""

import random
import re

from tpusnark.backend import groth16
from tpusnark.backend.groth16.solidity import export_solidity, proof_to_solidity_calldata
from tpusnark.curves.ref import G1, G2, Fp2, pairing_check
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder

P = BN254_FR.modulus


def _artifacts():
    b = Builder(P)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    cs = b.compile()
    st = random.Random(4)
    pk, vk = groth16.setup(cs, rng=lambda: st.randrange(1, P), use_device=False)
    proof = groth16.prove(cs, pk, {"x": 3, "y": 35}, rng=lambda: st.randrange(1, P))
    return cs, pk, vk, proof


def _const(src, name):
    return int(re.search(rf"constant {name} = (\d+);", src).group(1))


def test_export_and_simulated_evm_verify():
    _, _, vk, proof = _artifacts()
    src = export_solidity(vk)
    assert "function verifyProof(uint256[8] calldata proof, uint256[1] calldata input)" in src
    assert src.count("{") == src.count("}")

    # constants embed the vk
    assert _const(src, "ALPHA_X") == vk.alpha_g1[0]
    assert _const(src, "GAMMA_X1") == vk.gamma_g2[0].c1
    assert _const(src, "K_X_1") == vk.k[1][0]

    # run the contract's algorithm with host pairings (precompile stand-in)
    cd = proof_to_solidity_calldata(proof)
    inputs = [35]
    a = (cd[0], cd[1])
    bs = (Fp2(cd[3], cd[2]), Fp2(cd[5], cd[4]))
    c = (cd[6], cd[7])
    k = (_const(src, "K_X_0"), _const(src, "K_Y_0"))
    for i, v in enumerate(inputs):
        ki = (_const(src, f"K_X_{i+1}"), _const(src, f"K_Y_{i+1}"))
        k = G1.add(k, G1.mul(ki, v))
    alpha = (_const(src, "ALPHA_X"), _const(src, "ALPHA_Y"))
    beta = (Fp2(_const(src, "BETA_X0"), _const(src, "BETA_X1")),
            Fp2(_const(src, "BETA_Y0"), _const(src, "BETA_Y1")))
    gamma = (Fp2(_const(src, "GAMMA_X0"), _const(src, "GAMMA_X1")),
             Fp2(_const(src, "GAMMA_Y0"), _const(src, "GAMMA_Y1")))
    delta = (Fp2(_const(src, "DELTA_X0"), _const(src, "DELTA_X1")),
             Fp2(_const(src, "DELTA_Y0"), _const(src, "DELTA_Y1")))
    assert pairing_check([(G1.neg(a), bs), (alpha, beta), (k, gamma), (c, delta)])

    # tampered input must fail the pairing product
    k_bad = G1.add(k, G1.mul((_const(src, "K_X_1"), _const(src, "K_Y_1")), 1))
    assert not pairing_check([(G1.neg(a), bs), (alpha, beta), (k_bad, gamma), (c, delta)])


def test_export_rejects_commitment_vk():
    import pytest

    b = Builder(P)
    x = b.secret("x")
    pub = b.public("pub")
    cvar = b.commit(x, pub)
    b.assert_is_different(x, cvar)
    cs = b.compile()
    st = random.Random(6)
    _, vk = groth16.setup(cs, rng=lambda: st.randrange(1, P), use_device=False)
    with pytest.raises(NotImplementedError):
        export_solidity(vk)
