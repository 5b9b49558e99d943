"""Serialization tests: gnark wire formats.

- witness binary protocol golden vector straight from the reference docs
  (/root/reference/backend/witness/witness.go:33-36)
- point compression round-trips (gnark-crypto bn254 flag bits)
- proof / vk round-trips
"""

import random

from tpusnark.backend.witness import Witness
from tpusnark.curves.marshal import (
    g1_compress,
    g1_decode,
    g1_raw,
    g2_compress,
    g2_decode,
    g2_raw,
)
from tpusnark.curves.ref import G1, G2, R
from tpusnark.fields.spec import BN254_FR

P = BN254_FR.modulus
rng = random.Random(3)


def test_witness_golden_vector():
    # reference witness.go:33-36: Y=35 public; X=3, Z=2 secret
    w = Witness(n_public=1, n_secret=2, values=[35, 3, 2])
    want = (
        "000000010000000200000003"
        "0000000000000000000000000000000000000000000000000000000000000023"
        "0000000000000000000000000000000000000000000000000000000000000003"
        "0000000000000000000000000000000000000000000000000000000000000002"
    )
    assert w.to_bytes().hex() == want
    back = Witness.from_bytes(bytes.fromhex(want))
    assert back.values == [35, 3, 2]
    assert back.public().values == [35]


def test_g1_roundtrip():
    for s in [1, 2, 12345, R - 1]:
        pt = G1.mul(G1.generator(), s)
        dec, n = g1_decode(g1_compress(pt))
        assert n == 32 and dec == pt
        dec, n = g1_decode(g1_raw(pt))
        assert n == 64 and dec == pt
    assert g1_decode(g1_compress(None))[0] is None
    assert g1_decode(g1_raw(None))[0] is None


def test_g2_roundtrip():
    for s in [1, 7, 987654321]:
        pt = G2.mul(G2.generator(), s)
        dec, n = g2_decode(g2_compress(pt))
        assert n == 64 and dec == pt
        dec, n = g2_decode(g2_raw(pt))
        assert n == 128 and dec == pt
    assert g2_decode(g2_compress(None))[0] is None


def test_proof_vk_roundtrip():
    from tpusnark.backend.groth16.keys import Proof, VerifyingKey
    from tpusnark.backend.groth16.marshal import (
        proof_from_bytes,
        proof_to_bytes,
        vk_from_bytes,
        vk_to_bytes,
    )

    g = G1.generator()
    h = G2.generator()
    proof = Proof(ar=G1.mul(g, 3), krs=G1.mul(g, 7), bs=G2.mul(h, 9))
    for raw in (False, True):
        back = proof_from_bytes(proof_to_bytes(proof, raw=raw))
        assert back == proof
    vk = VerifyingKey(
        alpha_g1=G1.mul(g, 11),
        beta_g2=G2.mul(h, 13),
        gamma_g2=G2.mul(h, 17),
        delta_g2=G2.mul(h, 19),
        k=[G1.mul(g, 23), G1.mul(g, 29)],
    )
    for raw in (False, True):
        back = vk_from_bytes(vk_to_bytes(vk, raw=raw))
        assert (back.alpha_g1, back.beta_g2, back.gamma_g2, back.delta_g2, back.k) == (
            vk.alpha_g1,
            vk.beta_g2,
            vk.gamma_g2,
            vk.delta_g2,
            vk.k,
        )


def test_profiler():
    from tpusnark import profile
    from tpusnark.frontend.builder import Builder

    b = Builder(P)
    x = b.secret("x")
    with profile.start() as s:
        y = b.mul(x, x)
        b.mul(y, x)
    assert s.total == 2
    assert "test_serialization" in s.top()


def test_pk_roundtrip():
    """ProvingKey WriteTo/ReadFrom layout (marshal.go:235-290 structure:
    filtered A/B tables + infinity masks + domain header)."""
    from tpusnark.backend.groth16.keys import ProvingKey
    from tpusnark.backend.groth16.marshal import pk_from_bytes, pk_to_bytes
    from tpusnark.curves.ref import G1, G2

    g = G1.generator()
    h = G2.generator()
    pk = ProvingKey(
        alpha_g1=G1.mul(g, 3),
        beta_g1=G1.mul(g, 5),
        delta_g1=G1.mul(g, 7),
        beta_g2=G2.mul(h, 5),
        delta_g2=G2.mul(h, 7),
        a=[G1.mul(g, 2), None, G1.mul(g, 4)],
        b1=[None, G1.mul(g, 6), G1.mul(g, 8)],
        b2=[None, G2.mul(h, 6), G2.mul(h, 8)],
        k=[G1.mul(g, 9), None],
        z=[G1.mul(g, 10), G1.mul(g, 12)],
        domain_n=4,
    )
    for raw in (False, True):
        back = pk_from_bytes(pk_to_bytes(pk, raw=raw))
        for f in ("alpha_g1", "beta_g1", "delta_g1", "beta_g2", "delta_g2",
                  "a", "b1", "b2", "k", "z", "domain_n"):
            assert getattr(back, f) == getattr(pk, f), f
