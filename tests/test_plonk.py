"""PLONK backend end-to-end tests (small circuits on the CPU mesh).

Parity surface: the reference PLONK flow examples/plonk/main.go:30-40 —
compile a Plonkish circuit, Setup with a KZG SRS, Prove, Verify, and reject
bad public inputs / tampered proofs (the reference's invalid-witness
discipline, SURVEY.md §4)."""

import dataclasses

import pytest

from tpusnark.backend import plonk
from tpusnark.constraint.scs import UnsatisfiedGateError, solve_scs
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.plonk_builder import PlonkBuilder

P = BN254_FR.modulus


def build_cubic():
    """x**3 + x + 5 == y (the gnark hello-world, examples/cubic)."""
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    x3 = b.mul(x, x, x)
    b.assert_is_equal(b.add(x3, x, 5), y)
    return b, b.compile()


def cubic_assignment():
    return {"x": 3, "y": 35}


def test_scs_solver_satisfies():
    _, cs = build_cubic()
    W = solve_scs(cs, cubic_assignment())
    cf = cs.coeffs
    for g in cs.gates[cs.n_public :]:
        a, b_, c = W[g.xa], W[g.xb], W[g.xc]
        val = cf[g.qL] * a + cf[g.qR] * b_ + cf[g.qM] * a * b_ + cf[g.qO] * c + cf[g.qC]
        assert val % P == 0


def test_scs_solver_rejects_bad_witness():
    _, cs = build_cubic()
    with pytest.raises(UnsatisfiedGateError):
        solve_scs(cs, {"x": 3, "y": 36})


def _rng_seq(seed):
    import random

    r = random.Random(seed)
    return lambda: r.randrange(1, P)


@pytest.fixture(scope="module")
def plonk_artifacts():
    _, cs = build_cubic()
    pk, vk = plonk.setup(cs, tau=123456789)
    proof = plonk.prove(cs, pk, cubic_assignment(), rng=_rng_seq(42))
    return cs, pk, vk, proof


@pytest.mark.slow
def test_plonk_e2e(plonk_artifacts):
    _, _, vk, proof = plonk_artifacts
    assert plonk.verify(proof, vk, [35])


@pytest.mark.slow
def test_plonk_rejects_wrong_public(plonk_artifacts):
    _, _, vk, proof = plonk_artifacts
    assert not plonk.verify(proof, vk, [36])


@pytest.mark.slow
def test_plonk_rejects_tampered_eval(plonk_artifacts):
    _, _, vk, proof = plonk_artifacts
    cv = list(proof.claimed_values)
    cv[2] = (cv[2] + 1) % P  # tamper the claimed l(zeta)
    bad = dataclasses.replace(proof, claimed_values=cv)
    assert not plonk.verify(bad, vk, [35])


@pytest.mark.slow
def test_plonk_proof_marshal_roundtrip(plonk_artifacts):
    from tpusnark.backend.plonk.marshal import proof_from_bytes, proof_to_bytes

    _, _, vk, proof = plonk_artifacts
    data = proof_to_bytes(proof)
    # 9 compressed G1 points (LRO, Z, H0-2, batched H, Z-shifted H; reference
    # marshal.go:43-56) + fr vector (4 + 7*32) + zu (32) + bsb22 count
    assert len(data) == 9 * 32 + 4 + 7 * 32 + 32 + 4
    p2 = proof_from_bytes(data)
    assert plonk.verify(p2, vk, [35])


@pytest.mark.slow
def test_plonk_rejects_tampered_commitment(plonk_artifacts):
    _, _, vk, proof = plonk_artifacts
    bad = dataclasses.replace(proof, z_com=vk.ql)
    assert not plonk.verify(bad, vk, [35])


@pytest.mark.slow
def test_plonk_richer_circuit():
    """select/xor/is_zero/hints exercise hint solving + boolean gates."""
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    bits = b.to_binary(x, 8)
    parity = bits[0]
    even = b.is_zero(parity)
    # y == x*x + even
    b.assert_is_equal(b.add(b.mul(x, x), even), y)
    cs = b.compile()
    x = 6
    assign = {"x": x, "y": x * x + 1}  # x even -> even == 1
    pk, vk = plonk.setup(cs, tau=987654321)
    proof = plonk.prove(cs, pk, assign, rng=_rng_seq(7))
    assert plonk.verify(proof, vk, [assign["y"]])
    assert not plonk.verify(proof, vk, [assign["y"] + 1])


@pytest.mark.slow
def test_plonk_four_step_domain():
    """Domain >= NTT.FOUR_STEP_MIN (2^16): the quotient slice evaluator must
    dispatch to the four-step NTT (advisor r4 high: _get_slice_jit hard-coded
    the small-n _ntt_run and crashed for any domain >= 65536)."""
    from tpusnark.poly.ntt import NTT

    n_gates = NTT.FOUR_STEP_MIN  # forces domain_n == 2^16
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for i in range(n_gates - 16):
        acc = b.mul(acc, x) if i % 2 == 0 else b.add(acc, x)
    b.assert_is_equal(acc, y)
    cs = b.compile()
    xv, av = 3, 3
    for i in range(n_gates - 16):
        av = av * xv % P if i % 2 == 0 else (av + xv) % P
    assert cs.n_gates > NTT.FOUR_STEP_MIN // 2  # really lands in the big domain
    pk, vk = plonk.setup(cs, tau=123456789)
    proof = plonk.prove(cs, pk, {"x": xv, "y": av})
    assert plonk.verify(proof, vk, [av])
