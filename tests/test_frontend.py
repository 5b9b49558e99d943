"""Frontend + solver tests.

Reference parity: gnark's test-engine semantics (/root/reference/test/engine.go)
— circuits evaluated over big ints — plus invalid-witness negative tests
(first-class in gnark, SURVEY.md §4)."""

import pytest

from tpusnark.constraint.solver import UnsatisfiedConstraintError, compute_abc, solve
from tpusnark.fields.spec import BN254_FR_MOD
from tpusnark.frontend.builder import Builder


def build_cubic():
    """examples/cubic: x**3 + x + 5 == y (reference examples/cubic/cubic.go)."""
    b = Builder(BN254_FR_MOD)
    x = b.secret("X")
    y = b.public("Y")
    x3 = b.mul(x, x, x)
    b.assert_is_equal(b.add(x3, x, 5), y)
    return b.compile()


def test_cubic_solve():
    cs = build_cubic()
    W = solve(cs, {"X": 3, "Y": 35})
    assert W[0] == 1
    A, B, C = compute_abc(cs, W)
    p = cs.modulus
    for a, b_, c in zip(A, B, C):
        assert a * b_ % p == c % p
    assert cs.stats()["n_constraints"] >= 3


def test_cubic_invalid_witness():
    cs = build_cubic()
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, {"X": 3, "Y": 36})


def test_linear_ops_are_free():
    b = Builder(BN254_FR_MOD)
    x = b.secret("x")
    y = b.add(b.mul(x, 3), 7)  # constant scale + add: no constraints
    z = b.sub(y, x)
    b.assert_is_equal(z, 11)
    cs = b.compile()
    assert len(cs.constraints) == 1  # only the assert
    W = solve(cs, {"x": 2})  # 3*2+7-2 = 11
    assert W[1] == 2


def test_div_inverse():
    p = BN254_FR_MOD
    b = Builder(p)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.div(y, x), 21)
    b.assert_is_equal(b.mul(b.inverse(x), x), 1)
    cs = b.compile()
    W = solve(cs, {"x": 2, "y": 42})
    # division by zero must fail
    with pytest.raises(Exception):
        solve(cs, {"x": 0, "y": 0})


def test_is_zero_and_select():
    p = BN254_FR_MOD
    b = Builder(p)
    x = b.secret("x")
    z = b.is_zero(x)
    out = b.select(z, 100, 200)
    o = b.public("o")
    b.assert_is_equal(out, o)
    cs = b.compile()
    solve(cs, {"x": 0, "o": 100})
    solve(cs, {"x": 7, "o": 200})
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, {"x": 7, "o": 100})


def test_to_binary_roundtrip():
    p = BN254_FR_MOD
    b = Builder(p)
    x = b.secret("x")
    bits = b.to_binary(x, 8)
    y = b.from_binary(bits)
    b.assert_is_equal(x, y)
    o = b.public("lsb")
    b.assert_is_equal(bits[0], o)
    cs = b.compile()
    solve(cs, {"x": 0b10110101, "lsb": 1})
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, {"x": 0b10110100, "lsb": 1})
    # out-of-range value cannot satisfy the 8-bit decomposition
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, {"x": 256, "lsb": 0})


def test_boolean_ops():
    p = BN254_FR_MOD
    b = Builder(p)
    x, y = b.secret("x"), b.secret("y")
    o = b.public("o")
    b.assert_is_equal(b.xor(x, y), o)
    cs = b.compile()
    for xv in (0, 1):
        for yv in (0, 1):
            solve(cs, {"x": xv, "y": yv, "o": xv ^ yv})
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, {"x": 2, "y": 0, "o": 2})  # non-boolean rejected


def test_levels():
    b = Builder(BN254_FR_MOD)
    x = b.secret("x")
    # chain of multiplications -> deep levels
    cur = x
    for _ in range(5):
        cur = b.mul(cur, cur)
    b.assert_is_equal(cur, b.public("out"))
    cs = b.compile()
    levels = cs.compute_levels()
    assert len(levels) == 6  # 5 sequential muls + final assert
    assert sum(len(l) for l in levels) == len(cs.instructions)
