"""BLS12-381: tower/pairing sanity + REAL cross-library interop fixtures.

tests/fixtures/bellman_bls12381.json holds bellman-generated BLS12-381
vk/proof/input vectors (public test data, originally from
esuwu/groth16-verifier-bls12381, carried by the reference at
/root/reference/backend/groth16/bellman_test.go:19 where gnark's own
verifier consumes them). Accepting the same bytes here is the strongest
offline evidence of wire-format + verifier compatibility with gnark.
"""

import base64
import json
import os

import pytest

from tpusnark.backend.groth16 import bls381
from tpusnark.curves import bls12381 as C
from tpusnark.curves.marshal_bls import g1_compress, g1_decode, g2_compress, g2_decode

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "bellman_bls12381.json")


def test_pairing_bilinear():
    g1, g2 = C.G1.generator(), C.G2.generator()
    e = C.pairing(g1, g2)
    assert not e.is_one()
    assert C.pairing(C.G1.mul(g1, 6), C.G2.mul(g2, 35)) == e.pow(210)
    assert C.multi_pairing([(g1, g2), (C.G1.neg(g1), g2)]).is_one()


def test_point_codec_roundtrip():
    g1, g2 = C.G1.generator(), C.G2.generator()
    for k in (1, 2, 12345):
        p = C.G1.mul(g1, k)
        back, n = g1_decode(g1_compress(p))
        assert n == 48 and back == p
        q = C.G2.mul(g2, k)
        backq, n = g2_decode(g2_compress(q))
        assert n == 96 and backq == q
    assert g1_decode(g1_compress(None))[0] is None
    assert g2_decode(g2_compress(None))[0] is None


@pytest.fixture(scope="module")
def cases():
    with open(FIX) as f:
        return json.load(f)


def test_bellman_vk_parses(cases):
    vk = bls381.vk_from_bytes(base64.b64decode(cases[0]["vk"]))
    assert len(vk.k) == 2  # one public input
    assert C.G1.is_on_curve(vk.alpha_g1)
    assert C.G2.is_on_curve(vk.beta_g2)


def test_bellman_proof_verifies(cases):
    case = cases[0]
    assert case["ok"]
    vk = bls381.vk_from_bytes(base64.b64decode(case["vk"]))
    proof = bls381.proof_from_bytes(base64.b64decode(case["proof"]))
    inputs = bls381.inputs_from_bytes(base64.b64decode(case["inputs"]))
    assert bls381.verify(proof, vk, inputs)


def test_bellman_wrong_inputs_rejected(cases):
    case = cases[1]
    assert not case["ok"]
    vk = bls381.vk_from_bytes(base64.b64decode(case["vk"]))
    proof = bls381.proof_from_bytes(base64.b64decode(case["proof"]))
    inputs = bls381.inputs_from_bytes(base64.b64decode(case["inputs"]))
    assert not bls381.verify(proof, vk, inputs)


def test_bellman_no_inputs_case(cases):
    case = cases[2]
    assert case["ok"]
    vk = bls381.vk_from_bytes(base64.b64decode(case["vk"]))
    proof = bls381.proof_from_bytes(base64.b64decode(case["proof"]))
    inputs = bls381.inputs_from_bytes(base64.b64decode(case["inputs"]))
    assert inputs == []
    assert bls381.verify(proof, vk, inputs)
