"""Emulated short-Weierstrass curve + ECDSA gadget tests.

Reference parity: /root/reference/std/algebra/emulated/sw_emulated/point.go,
/root/reference/std/signature/ecdsa/ecdsa.go. Oracle: plain Python affine
secp256k1 arithmetic + a from-scratch ECDSA signer.
"""

import hashlib
import random

import pytest

from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.gadgets.sw_emulated import (
    SECP256K1,
    EmulatedCurve,
    ecdsa_verify_sig,
)
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus
rng = random.Random(13)
C = SECP256K1


# ----------------------------------------------------------- python oracle
def _add(P1, P2):
    p = C.p
    if P1 is None:
        return P2
    if P2 is None:
        return P1
    x1, y1 = P1
    x2, y2 = P2
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P1 == P2:
        lam = (3 * x1 * x1) * pow(2 * y1, p - 2, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return x3, (lam * (x1 - x3) - y1) % p


def _smul(k, pt):
    acc = None
    while k:
        if k & 1:
            acc = _add(acc, pt)
        pt = _add(pt, pt)
        k >>= 1
    return acc


GEN = (C.gx, C.gy)


def _sign(priv, msg: bytes):
    h = int.from_bytes(hashlib.sha256(msg).digest(), "big") % C.order
    while True:
        k = rng.randrange(1, C.order)
        x, _ = _smul(k, GEN)
        r = x % C.order
        if r == 0:
            continue
        s = pow(k, -1, C.order) * (h + r * priv) % C.order
        if s:
            return h, r, s


def test_oracle_sanity():
    assert _smul(C.order, GEN) is None
    x, y = _smul(2, GEN)
    assert (y * y - x * x * x - 7) % C.p == 0


def test_emu_curve_ops_engine():
    eng = TestEngine(P, {})
    cv = EmulatedCurve(eng, C)
    a = _smul(rng.randrange(2, C.order), GEN)
    b = _smul(rng.randrange(2, C.order), GEN)
    pa = cv.constant_point(*a)
    pb = cv.constant_point(*b)
    cv.assert_on_curve(pa)
    s = cv.add_unsafe(pa, pb)
    expect = _add(a, b)
    assert cv.F.to_value(cv.F.reduce(s.x)) == expect[0]
    assert cv.F.to_value(cv.F.reduce(s.y)) == expect[1]
    d = cv.double(pa)
    expect = _add(a, a)
    assert cv.F.to_value(cv.F.reduce(d.x)) == expect[0]
    assert cv.F.to_value(cv.F.reduce(d.y)) == expect[1]


def test_emu_scalar_mul_engine():
    eng = TestEngine(P, {})
    cv = EmulatedCurve(eng, C)
    k = rng.randrange(2, 1 << 48)
    bits = [(k >> i) & 1 for i in range(48)]
    got = cv.scalar_mul(cv.generator(), bits)
    expect = _smul(k, GEN)
    assert cv.F.to_value(cv.F.reduce(got.x)) == expect[0]
    assert cv.F.to_value(cv.F.reduce(got.y)) == expect[1]


def test_ecdsa_verify_engine():
    eng = TestEngine(P, {})
    cv = EmulatedCurve(eng, C)
    priv = rng.randrange(1, C.order)
    pub = _smul(priv, GEN)
    h, r, s = _sign(priv, b"tpu-native ecdsa")
    prm_q = None
    from tpusnark.gadgets.emulated import EmuParams

    prm_q = EmuParams.for_modulus(C.order)
    assert ecdsa_verify_sig(
        eng, cv, cv.constant_point(*pub),
        prm_q.decompose(h), prm_q.decompose(r), prm_q.decompose(s))


def test_ecdsa_rejects_bad_signature_engine():
    eng = TestEngine(P, {})
    cv = EmulatedCurve(eng, C)
    priv = rng.randrange(1, C.order)
    pub = _smul(priv, GEN)
    h, r, s = _sign(priv, b"message one")
    from tpusnark.gadgets.emulated import EmuParams

    prm_q = EmuParams.for_modulus(C.order)
    with pytest.raises(Exception):
        ecdsa_verify_sig(
            eng, cv, cv.constant_point(*pub),
            prm_q.decompose(h), prm_q.decompose((r + 1) % C.order),
            prm_q.decompose(s))


def test_emu_curve_add_compiled():
    """Point addition compiled to R1CS: witness points as limb secrets."""
    from tpusnark.gadgets.emulated import EmuParams

    prm = EmuParams.for_modulus(C.p)
    a = _smul(rng.randrange(2, C.order), GEN)
    b = _smul(rng.randrange(2, C.order), GEN)
    expect = _add(a, b)

    bld = Builder(P)
    cv = EmulatedCurve(bld, C)
    pa = cv.from_limbs([bld.secret(f"ax{i}") for i in range(prm.n_limbs)],
                       [bld.secret(f"ay{i}") for i in range(prm.n_limbs)])
    pb = cv.from_limbs([bld.secret(f"bx{i}") for i in range(prm.n_limbs)],
                       [bld.secret(f"by{i}") for i in range(prm.n_limbs)])
    cv.assert_on_curve(pa)
    cv.assert_on_curve(pb)
    s = cv.add_unsafe(pa, pb)
    out = cv.from_limbs([bld.public(f"sx{i}") for i in range(prm.n_limbs)],
                        [bld.public(f"sy{i}") for i in range(prm.n_limbs)])
    cv.assert_equal(s, out)
    cs = bld.compile()

    assign = {}
    for name, v in (("ax", a[0]), ("ay", a[1]), ("bx", b[0]), ("by", b[1]),
                    ("sx", expect[0]), ("sy", expect[1])):
        for i, l in enumerate(prm.decompose(v)):
            assign[f"{name}{i}"] = l
    solve(cs, assign)

    bad = dict(assign)
    bad["sx0"] = (bad["sx0"] + 1) % P
    with pytest.raises(Exception):
        solve(cs, bad)


# --------------------------------------------- complete (flagged) operations
def _flag(eng, v):
    """Normalize a flag (int or engine var) to a python int."""
    return int(v) if isinstance(v, int) else int(eng.constant_value(v))


def test_add_unified_cases():
    """add_unified covers add, double, annihilation, and zero flags
    (advisor r3 medium: the unflagged path was unsatisfiable for s = 0)."""
    eng = TestEngine(P, {})
    cv = EmulatedCurve(eng, C)
    a = _smul(5, GEN)
    b = _smul(9, GEN)
    pa, pb = cv.constant_point(*a), cv.constant_point(*b)

    # generic add
    r, rz = cv.add_unified(pa, pb)
    expect = _add(a, b)
    assert _flag(eng, rz) == 0
    assert cv.F.to_value(cv.F.reduce(r.x)) == expect[0]
    assert cv.F.to_value(cv.F.reduce(r.y)) == expect[1]

    # unified doubling (P == Q)
    r, rz = cv.add_unified(pa, pa)
    expect = _add(a, a)
    assert _flag(eng, rz) == 0
    assert cv.F.to_value(cv.F.reduce(r.x)) == expect[0]

    # annihilation P + (-P) -> flagged identity, still satisfiable
    r, rz = cv.add_unified(pa, cv.neg(pa))
    assert _flag(eng, rz) == 1

    # zero flags pass the other operand through
    r, rz = cv.add_unified(pa, cv.zero_point(), 0, 1)
    assert _flag(eng, rz) == 0
    assert cv.F.to_value(cv.F.reduce(r.x)) == a[0]
    r, rz = cv.add_unified(cv.zero_point(), pb, 1, 0)
    assert cv.F.to_value(cv.F.reduce(r.x)) == b[0]
    r, rz = cv.add_unified(cv.zero_point(), cv.zero_point(), 1, 1)
    assert _flag(eng, rz) == 1


def test_scalar_mul_flagged_zero_and_nonzero():
    eng = TestEngine(P, {})
    cv = EmulatedCurve(eng, C)
    k = rng.randrange(2, 1 << 48)
    bits = [(k >> i) & 1 for i in range(48)]
    got, gz = cv.scalar_mul_flagged(cv.generator(), bits)
    expect = _smul(k, GEN)
    assert _flag(eng, gz) == 0
    assert cv.F.to_value(cv.F.reduce(got.x)) == expect[0]
    assert cv.F.to_value(cv.F.reduce(got.y)) == expect[1]

    # s == 0: previously divided by zero in the AUX subtraction; now flagged
    got, gz = cv.scalar_mul_flagged(cv.generator(), [0] * 48)
    assert _flag(eng, gz) == 1
