"""uints word gadgets + SHA-256 gadget: engine-vs-hashlib oracle and a
compiled-circuit solve check (the dual-interpreter strategy, SURVEY.md §4).

Reference parity targets: /root/reference/std/math/uints/uint8.go,
/root/reference/std/hash/sha2/sha2_test.go (hashlib is the oracle there too).
"""

import hashlib

import pytest

from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.gadgets import sha2
from tpusnark.gadgets import uints as u
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus


def test_uints_ops_engine():
    eng = TestEngine(P, {})
    a, b = 0xDEADBEEF, 0x12345678
    wa = u.value_of(eng, a)
    wb = u.value_of(eng, b)
    assert u.to_var(eng, u.xor(eng, wa, wb)) == a ^ b
    assert u.to_var(eng, u.and_(eng, wa, wb)) == a & b
    assert u.to_var(eng, u.or_(eng, wa, wb)) == a | b
    assert u.to_var(eng, u.not_(eng, wa)) == a ^ 0xFFFFFFFF
    assert u.to_var(eng, u.rotr(wa, 7)) == ((a >> 7) | (a << 25)) & 0xFFFFFFFF
    assert u.to_var(eng, u.rotl(wa, 13)) == ((a << 13) | (a >> 19)) & 0xFFFFFFFF
    assert u.to_var(eng, u.shr(wa, 9)) == a >> 9
    assert u.to_var(eng, u.shl(wa, 9)) == (a << 9) & 0xFFFFFFFF
    assert u.to_var(eng, u.add(eng, wa, wb, wb)) == (a + 2 * b) & 0xFFFFFFFF
    assert u.to_bytes_be(eng, wa) == [0xDE, 0xAD, 0xBE, 0xEF]


@pytest.mark.parametrize("msg", [b"", b"abc", b"a" * 55, b"b" * 56, b"c" * 130])
def test_sha256_engine_vs_hashlib(msg):
    eng = TestEngine(P, {})
    got = sha2.sha256_of_bytes(eng, list(msg))
    assert bytes(int(x) for x in got) == hashlib.sha256(msg).digest()


def test_uints_add_compiled_solve():
    """Word adder through the real R1CS pipeline: compile + solve + negative."""
    from tpusnark.constraint.solver import solve

    b = Builder(P)
    x = b.secret("x")
    y = b.secret("y")
    z = b.public("z")
    wsum = u.add(b, u.from_var(b, x), u.from_var(b, y))
    b.assert_is_equal(u.to_var(b, wsum), z)
    cs = b.compile()

    a_val, b_val = 0xFFFF_FFF0, 0x25
    good = {"x": a_val, "y": b_val, "z": (a_val + b_val) & 0xFFFFFFFF}
    solve(cs, good)  # must not raise

    bad = {"x": a_val, "y": b_val, "z": (a_val + b_val)}  # no truncation
    with pytest.raises(Exception):
        solve(cs, bad)


def test_sha256_compiled_solve():
    """One-block SHA-256 compiled to R1CS and solved (slow-ish but bounded)."""
    from tpusnark.constraint.solver import solve

    msg = b"tpu-native snark"
    expect = hashlib.sha256(msg).digest()
    b = Builder(P)
    in_vars = [b.secret(f"m{i}") for i in range(len(msg))]
    # constrain inputs to byte range like gnark's U8 newness check
    for v in in_vars:
        b.to_binary(v, 8)
    digest = sha2.sha256_of_bytes(b, in_vars)
    outs = [b.public(f"d{i}") for i in range(32)]
    for dv, ov in zip(digest, outs, strict=True):
        b.assert_is_equal(dv, ov)
    cs = b.compile()
    assign = {f"m{i}": c for i, c in enumerate(msg)}
    assign.update({f"d{i}": c for i, c in enumerate(expect)})
    solve(cs, assign)  # must not raise
