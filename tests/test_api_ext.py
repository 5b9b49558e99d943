"""Extended frontend API (reference frontend/api.go:26-162): MulAcc,
DivUnchecked, BatchInvert, Lookup2, Cmp, AssertIsCrumb, MarkBoolean,
Println — one shared implementation checked on all three interpreters."""

import pytest

from tpusnark.constraint.scs import solve_scs
from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.frontend.plonk_builder import PlonkBuilder
from tpusnark.testing.engine import TestEngine, is_solved

P = BN254_FR.modulus


def _check_all(define, valid, invalid=()):
    """engine + R1CS solver + SCS solver agree."""
    for a in valid:
        assert is_solved(define, P, a), a
    for a in invalid:
        assert not is_solved(define, P, a), a
    b = Builder(P)
    define(b)
    cs = b.compile()
    for a in valid:
        solve(cs, a)
    for a in invalid:
        with pytest.raises(Exception):
            solve(cs, a)
    pb = PlonkBuilder(P)
    define(pb)
    scs = pb.compile()
    for a in valid:
        solve_scs(scs, a)
    for a in invalid:
        with pytest.raises(Exception):
            solve_scs(scs, a)


def test_mul_acc():
    def c(api):
        a, b2, c2 = api.secret("a"), api.secret("b"), api.secret("c")
        api.assert_is_equal(api.mul_acc(a, b2, c2), api.public("out"))

    _check_all(c, [{"a": 5, "b": 3, "c": 4, "out": 17}], [{"a": 5, "b": 3, "c": 4, "out": 18}])


def test_div_unchecked_zero_over_zero():
    def c(api):
        x, y = api.secret("x"), api.secret("y")
        api.assert_is_equal(api.div_unchecked(x, y), api.public("q"))

    _check_all(
        c,
        [{"x": 12, "y": 4, "q": 3}, {"x": 0, "y": 0, "q": 0}],
        [{"x": 12, "y": 4, "q": 4}, {"x": 5, "y": 0, "q": 0}],
    )


def test_batch_invert():
    def c(api):
        xs = [api.secret(f"x{i}") for i in range(3)]
        invs = api.batch_invert(xs)
        api.assert_is_equal(invs[1], api.public("i1"))

    i1 = pow(7, -1, P)
    _check_all(c, [{"x0": 2, "x1": 7, "x2": 9, "i1": i1}], [{"x0": 2, "x1": 7, "x2": 9, "i1": 5}])


def test_lookup2():
    def c(api):
        b0, b1 = api.secret("b0"), api.secret("b1")
        out = api.lookup2(b0, b1, 10, 11, 12, 13)
        api.assert_is_equal(out, api.public("out"))

    valid = [
        {"b0": 0, "b1": 0, "out": 10},
        {"b0": 1, "b1": 0, "out": 11},
        {"b0": 0, "b1": 1, "out": 12},
        {"b0": 1, "b1": 1, "out": 13},
    ]
    _check_all(c, valid, [{"b0": 1, "b1": 1, "out": 12}, {"b0": 2, "b1": 0, "out": 10}])


def test_cmp():
    def c(api):
        a, b2 = api.secret("a"), api.secret("b")
        api.assert_is_equal(api.cmp(a, b2, nbits=8), api.public("r"))

    _check_all(
        c,
        [
            {"a": 5, "b": 9, "r": P - 1},
            {"a": 9, "b": 5, "r": 1},
            {"a": 7, "b": 7, "r": 0},
        ],
        [{"a": 5, "b": 9, "r": 1}],
    )


def test_assert_is_crumb():
    def c(api):
        api.assert_is_crumb(api.secret("x"))

    _check_all(c, [{"x": 0}, {"x": 1}, {"x": 2}, {"x": 3}], [{"x": 4}, {"x": P - 1}])


def test_mark_boolean_skips_constraint():
    b = Builder(P)
    x = b.secret("x")
    b.mark_boolean(x)
    n0 = len(b.cs.constraints)
    b.assert_is_boolean(x)  # no-op: already marked
    assert len(b.cs.constraints) == n0
    assert b.is_boolean(x)


def test_println_resolves_at_solve():
    b = Builder(P)
    x = b.secret("x")
    y = b.mul(x, x)
    b.println(x, y, 42)
    b.assert_is_equal(y, b.public("out"))
    cs = b.compile()
    solve(cs, {"x": 3, "out": 9})
    assert cs.solve_logs == ["3 9 42"]

    pb = PlonkBuilder(P)
    x = pb.secret("x")
    y = pb.mul(x, x)
    pb.println(x, y, 42)
    pb.assert_is_equal(y, pb.public("out"))
    scs = pb.compile()
    solve_scs(scs, {"x": 3, "out": 9})
    assert scs.solve_logs == ["3 9 42"]
