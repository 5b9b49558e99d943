"""Selector gadget tests (std/selector analog), engine + R1CS oracle."""

from tpusnark.fields.spec import BN254_FR
from tpusnark.gadgets.selector import is_in_slice, map_lookup, mux
from tpusnark.testing.engine import TestEngine, is_solved

P = BN254_FR.modulus


def test_mux():
    def define(api):
        sel = api.secret("sel")
        out = mux(api, sel, 10, 20, 30, 40)
        api.assert_is_equal(out, api.public("out"))

    assert is_solved(define, P, {"sel": 2, "out": 30})
    assert not is_solved(define, P, {"sel": 2, "out": 20})
    assert not is_solved(define, P, {"sel": 7, "out": 0})  # out of range


def test_map_lookup():
    def define(api):
        q = api.secret("q")
        out = map_lookup(api, q, [5, 9, 13], [50, 90, 130])
        api.assert_is_equal(out, api.public("out"))

    assert is_solved(define, P, {"q": 9, "out": 90})
    assert not is_solved(define, P, {"q": 8, "out": 90})


def test_is_in_slice():
    def define(api):
        x = api.secret("x")
        api.assert_is_equal(is_in_slice(api, x, [3, 1, 4, 1, 5]), api.public("hit"))

    assert is_solved(define, P, {"x": 4, "hit": 1})
    assert is_solved(define, P, {"x": 1, "hit": 1})  # duplicate entries ok
    assert is_solved(define, P, {"x": 9, "hit": 0})


def test_mux_r1cs_solver():
    from tpusnark.constraint.solver import compute_abc, solve
    from tpusnark.frontend.builder import Builder

    b = Builder(P)
    sel = b.secret("sel")
    out = mux(b, sel, 10, 20, 30)
    b.assert_is_equal(out, b.public("out"))
    cs = b.compile()
    W = solve(cs, {"sel": 1, "out": 20})
    A, B, C = compute_abc(cs, W)
    assert all((a * bb - c) % P == 0 for a, bb, c in zip(A, B, C))
