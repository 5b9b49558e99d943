"""BLS12-381 Groth16 prover end-to-end: ONE parametrized setup/prove over a
CurveConfig (SURVEY §7 no-codegen claim), proof checked by the independent
BLS12-381 pairing verifier (backend/groth16/bls381.verify, the module that
already validates real bellman interop fixtures).

Reference curve dispatch being replaced:
/root/reference/backend/backend.go:28-33 + the generated
backend/groth16/bls12-381/ package.
"""

import random

from tpusnark.backend.groth16.bls381 import ProofBLS, VerifyingKeyBLS
from tpusnark.backend.groth16.bls381 import verify as bls_verify
from tpusnark.backend.groth16.prove import prove
from tpusnark.backend.groth16.setup import setup
from tpusnark.fields.spec import BLS12_381_FR
from tpusnark.frontend.builder import Builder

R = BLS12_381_FR.modulus


def _cubic():
    b = Builder(R)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    return b.compile()


def _rng(seed):
    st = random.Random(seed)
    return lambda: st.randrange(1, R)


def test_bls12381_groth16_prove_verify():
    cs = _cubic()
    pk, vk = setup(cs, rng=_rng(3), curve="bls12-381", use_device=False)
    assert pk.curve == "bls12-381"
    assignment = {"x": 3, "y": 35}
    proof = prove(cs, pk, assignment, rng=_rng(5))

    vkb = VerifyingKeyBLS(
        alpha_g1=vk.alpha_g1,
        beta_g1=vk.beta_g1,
        beta_g2=vk.beta_g2,
        gamma_g2=vk.gamma_g2,
        delta_g1=vk.delta_g1,
        delta_g2=vk.delta_g2,
        k=vk.k,
    )
    pb = ProofBLS(ar=proof.ar, bs=proof.bs, krs=proof.krs)
    assert bls_verify(pb, vkb, [35])
    # negative: wrong public input
    assert not bls_verify(pb, vkb, [36])


def test_bls12381_groth16_device_setup_path():
    """Device fixed-base setup ladder over the BLS curve (exercises the
    parametrized jcurve b=4 ops + encodings on the virtual mesh backend)."""
    import sys

    import tpusnark.backend.groth16.setup  # noqa: F401

    su = sys.modules["tpusnark.backend.groth16.setup"]
    old = su._DEVICE_THRESHOLD
    su._DEVICE_THRESHOLD = 1  # force the device batch-mul path
    try:
        cs = _cubic()
        pk, vk = setup(cs, rng=_rng(7), curve="bls12-381")
        proof = prove(cs, pk, {"x": 2, "y": 15}, rng=_rng(9))
    finally:
        su._DEVICE_THRESHOLD = old
    vkb = VerifyingKeyBLS(
        alpha_g1=vk.alpha_g1,
        beta_g1=vk.beta_g1,
        beta_g2=vk.beta_g2,
        gamma_g2=vk.gamma_g2,
        delta_g1=vk.delta_g1,
        delta_g2=vk.delta_g2,
        k=vk.k,
    )
    assert bls_verify(ProofBLS(ar=proof.ar, bs=proof.bs, krs=proof.krs), vkb, [15])
