"""Native 2-chain recursion tests: BLS12-377 tower/pairing gadgets and the
in-circuit Groth16 verifier, over the NATIVE field (BW6-761 scalar field =
BLS12-377 base field). Reference parity:
/root/reference/std/algebra/native/sw_bls12377/ +
std/recursion/groth16/verifier.go:36-40.

All gadget checks run through the big-int test engine (the reference's
test-engine discipline, SURVEY.md §4) — exact and fast; the outer circuit
is additionally compiled through the frontend to record its native
constraint count."""

import random

import pytest

from tpusnark.curves import bls12377 as host
from tpusnark.fields.spec import BLS12_377_FR
from tpusnark.gadgets.native_tower import NFp2, NFp12
from tpusnark.gadgets.recursion_native import NativeGroth16Verifier, NativeVkConst
from tpusnark.testing.engine import CircuitNotSatisfiedError, TestEngine

P = host.P


def _rand_fp12(rng):
    def f2():
        return host.Fp2(rng.randrange(P), rng.randrange(P))

    def f6():
        return host.Fp6(f2(), f2(), f2())

    return host.Fp12(f6(), f6())


def _as_vars(f12g, c):
    """Host Fp12 -> engine 'variables' (ints) with the gadget layout."""
    return f12g.const(c)


def _to_host(val):
    """Gadget Fp12 (nested int tuples from the engine) -> host Fp12."""
    (a0, a1, a2), (b0, b1, b2) = val

    def h2(t):
        return host.Fp2(int(t[0]), int(t[1]))

    return host.Fp12(
        host.Fp6(h2(a0), h2(a1), h2(a2)), host.Fp6(h2(b0), h2(b1), h2(b2))
    )


def test_native_tower_vs_host_oracle():
    api = TestEngine(P, {})
    f12 = NFp12(api)
    rng = random.Random(11)
    a, b = _rand_fp12(rng), _rand_fp12(rng)
    av, bv = _as_vars(f12, a), _as_vars(f12, b)
    assert _to_host(f12.mul(av, bv)) == a * b
    assert _to_host(f12.square(av)) == a.square()
    assert _to_host(f12.inv(av)) == a.inv()
    assert _to_host(f12.conj(av)) == a.conj()
    # frobenius constants against the host p-power map
    assert _to_host(f12.frobenius(av, 1)) == a.pow(P)
    assert _to_host(f12.frobenius(av, 2)) == a.pow(P * P)
    # Fp2 inversion hint discipline
    f2 = NFp2(api)
    x = host.Fp2(rng.randrange(P), rng.randrange(P))
    xi = f2.inv(f2.const(x))
    assert host.Fp2(int(xi[0]), int(xi[1])) == x.inv()


def test_final_exp_identity_and_gadget():
    # the verified decomposition behind final_exp_3h
    x = host.X_SEED
    h = (P**4 - P**2 + 1) // host.R
    assert (x - 1) ** 2 * (x + P) * (x**2 + P**2 - 1) + 3 == 3 * h
    api = TestEngine(P, {})
    f12 = NFp12(api)
    rng = random.Random(5)
    f = _rand_fp12(rng)
    got = _to_host(f12.final_exp_3h(_as_vars(f12, f)))
    # the gadget includes the easy part: output == finalexp(f)^3
    assert got == host.final_exp(f).pow(3)


def test_native_miller_vs_host():
    api = TestEngine(P, {})
    v = NativeGroth16Verifier(api)
    rng = random.Random(7)
    p1 = host.G1.mul(host.G1.generator(), rng.randrange(1, host.R))
    q1 = host.G2.mul(host.G2.generator(), rng.randrange(1, host.R))
    pv = (p1[0], p1[1])
    qv = v.g2.constant(q1)
    got = _to_host(v.miller(pv, qv))
    assert got == host.miller_loop(p1, q1)


def _inner_proof():
    """A real BLS12-377 Groth16 proof of the cubic circuit."""
    from tpusnark.backend.groth16.prove import prove
    from tpusnark.backend.groth16.setup import setup
    from tpusnark.frontend.builder import Builder

    r = BLS12_377_FR.modulus
    b = Builder(r)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    cs = b.compile()
    rng = random.Random(42)
    pk, vk = setup(
        cs, rng=lambda: rng.randrange(1, r), curve="bls12-377", use_device=False
    )
    proof = prove(cs, pk, {"x": 3, "y": 35}, rng=lambda: rng.randrange(1, r))
    return proof, vk


def _outer_assert(engine_assignment, proof, vk, pub):
    api = TestEngine(P, engine_assignment)
    v = NativeGroth16Verifier(api)
    ar = (proof.ar[0], proof.ar[1])
    krs = (proof.krs[0], proof.krs[1])
    bs = (
        (proof.bs[0].c0, proof.bs[0].c1),
        (proof.bs[1].c0, proof.bs[1].c1),
    )
    v.assert_proof(NativeVkConst.from_vk(vk), ar, bs, krs, pub)


@pytest.mark.slow
def test_native_recursion_verifies_real_proof():
    proof, vk = _inner_proof()
    from tpusnark.backend.groth16.verify import verify

    assert verify(proof, vk, [35], curve="bls12-377")
    _outer_assert({}, proof, vk, [35])  # engine: all asserts hold
    # tampered public input -> the pairing equation must fail
    with pytest.raises((CircuitNotSatisfiedError, AssertionError)):
        _outer_assert({}, proof, vk, [36])
    # tampered proof point -> on-curve or pairing failure
    import dataclasses

    bad = dataclasses.replace(proof, ar=(proof.ar[0], (proof.ar[1] + 1) % P))
    with pytest.raises((CircuitNotSatisfiedError, AssertionError)):
        _outer_assert({}, bad, vk, [35])


@pytest.mark.slow
def test_native_recursion_constraint_count():
    """The 2-chain's point: the outer circuit compiles at NATIVE cost.
    Records the count and bounds it far under the emulated verifier's
    (~10^6-constraint) regime."""
    from tpusnark.frontend.builder import Builder

    proof, vk = _inner_proof()
    b = Builder(P)
    yv = b.public("y")
    v = NativeGroth16Verifier(b)
    ar = (proof.ar[0], proof.ar[1])
    krs = (proof.krs[0], proof.krs[1])
    bs = (
        (proof.bs[0].c0, proof.bs[0].c1),
        (proof.bs[1].c0, proof.bs[1].c1),
    )
    v.assert_proof(NativeVkConst.from_vk(vk), ar, bs, krs, [yv])
    cs = b.compile()
    n = len(cs.constraints)
    assert n < 400_000, f"native verifier should be far under emulated cost, got {n}"
    # solvable with the correct public input
    from tpusnark.constraint.solver import solve

    W = solve(cs, {"y": 35})
    assert W is not None
