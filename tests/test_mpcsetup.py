"""MPC trusted setup (Powers-of-Tau) ceremony tests.

Mirrors the reference's setup_test.go
(/root/reference/backend/groth16/bn254/mpcsetup/setup_test.go): run a
multi-contributor phase 1 + phase 2, verify every contribution, extract
keys, then prove and verify a circuit under the ceremony keys.
"""

import pytest

from tpusnark.backend import groth16
from tpusnark.backend.groth16 import mpcsetup
from tpusnark.curves.hash_to_g2 import G2_COFACTOR, hash_to_g2
from tpusnark.curves.ref import G2, R
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder


def _cubic():
    b = Builder(BN254_FR.modulus)
    x = b.secret("x")
    y = b.public("y")
    x3 = b.mul(x, x, x)
    b.assert_is_equal(b.add(x3, x, 5), y)
    return b.compile()


def test_hash_to_g2_subgroup_and_determinism():
    q1 = hash_to_g2(b"hello", b"dst-a")
    q2 = hash_to_g2(b"hello", b"dst-a")
    q3 = hash_to_g2(b"hello", b"dst-b")
    assert q1 == q2
    assert q3 != q1
    assert G2.in_subgroup(q1)
    # cofactor sanity: h2 * r == twist order used for clearing
    assert G2_COFACTOR % R != 0


def test_public_key_pok_roundtrip():
    pk = mpcsetup.new_public_key(12345, b"challenge", 1)
    r_pt = mpcsetup.gen_r(pk.sg, pk.sxg, b"challenge", 1)
    assert mpcsetup.same_ratio(pk.sg, pk.sxg, pk.xr, r_pt)
    # wrong challenge -> different R -> PoK fails
    r_bad = mpcsetup.gen_r(pk.sg, pk.sxg, b"other", 1)
    assert not mpcsetup.same_ratio(pk.sg, pk.sxg, pk.xr, r_bad)
    # serialization round-trip
    pk2 = mpcsetup.PublicKey.from_bytes(pk.to_bytes())
    assert pk2.sg == pk.sg and pk2.sxg == pk.sxg and pk2.xr == pk.xr


def test_ceremony_end_to_end():
    import copy
    import random

    st = random.Random(0xCE5E)
    rng = lambda: st.randrange(1, R)  # noqa: E731

    # phase 1 with 2 contributors over a 2^3 SRS
    p1_init = mpcsetup.init_phase1(3)
    p1_a = copy.deepcopy(p1_init)
    p1_a.contribute(rng)
    p1_b = copy.deepcopy(p1_a)
    p1_b.contribute(rng)
    mpcsetup.verify_phase1(p1_init, p1_a, p1_b)

    # serialization round-trip mid-ceremony (resumable artifacts)
    p1_restored = mpcsetup.Phase1.from_bytes(p1_b.to_bytes())
    assert p1_restored.tau_g1 == p1_b.tau_g1
    assert p1_restored.hash == p1_b.hash
    mpcsetup.verify_phase1(p1_a, p1_restored)

    # phase 2 bound to the cubic circuit, 2 contributors
    cs = _cubic()
    p2_init, evals = mpcsetup.init_phase2(cs, p1_b)
    p2_a = copy.deepcopy(p2_init)
    p2_a.contribute(rng)
    p2_b = copy.deepcopy(p2_a)
    p2_b.contribute(rng)
    mpcsetup.verify_phase2(p2_init, p2_a, p2_b)

    p2_restored = mpcsetup.Phase2.from_bytes(p2_b.to_bytes())
    assert p2_restored.l_g1 == p2_b.l_g1

    # extract keys and prove
    pk, vk = mpcsetup.extract_keys(cs, p1_b, p2_b, evals)
    assign = {"x": 3, "y": 35}
    proof = groth16.prove(cs, pk, assign)
    assert groth16.verify(proof, vk, [35])
    assert not groth16.verify(proof, vk, [36])


def test_tampered_contribution_rejected():
    import copy
    import random

    st = random.Random(0xBAD)
    rng = lambda: st.randrange(1, R)  # noqa: E731

    p1_init = mpcsetup.init_phase1(2)
    p1_a = copy.deepcopy(p1_init)
    p1_a.contribute(rng)

    # tamper: swap in a fresh PoK not derived from the previous hash
    p1_bad = copy.deepcopy(p1_a)
    p1_bad.pk_tau = mpcsetup.new_public_key(7, b"forged", 1, rng)
    with pytest.raises(ValueError):
        mpcsetup.verify_phase1(p1_init, p1_bad)

    # tamper: replace a parameter point (breaks geometric consistency)
    p1_bad2 = copy.deepcopy(p1_a)
    p1_bad2.tau_g1[2] = p1_bad2.tau_g1[1]
    p1_bad2.hash = p1_bad2.compute_hash()
    with pytest.raises(ValueError):
        mpcsetup.verify_phase1(p1_init, p1_bad2)
