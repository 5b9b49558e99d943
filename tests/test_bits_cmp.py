"""bits (ternary/NAF) + cmp (bounded comparators) gadget tests.

Reference parity: /root/reference/std/math/bits/{conversion_ternary.go,naf.go},
/root/reference/std/math/cmp/bounded.go.
"""

import pytest

from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.gadgets import bits as gbits
from tpusnark.gadgets.cmp import BoundedComparator, is_equal
from tpusnark.testing.engine import TestEngine, is_solved

P = BN254_FR.modulus


def test_ternary_roundtrip_engine():
    eng = TestEngine(P, {})
    for v in [0, 1, 2, 3, 80, 3**9 - 1]:
        digits = gbits.to_ternary(eng, v, 10)
        assert all(d in (0, 1, 2) for d in digits)
        assert gbits.from_ternary(eng, digits) == v


def test_naf_engine():
    eng = TestEngine(P, {})
    for v in [0, 1, 7, 255, 0b1011011]:
        digits = gbits.to_naf(eng, v, 10)
        signed = [d if d <= 1 else d - P for d in digits]
        assert all(d in (-1, 0, 1) for d in signed)
        assert sum(d << i for i, d in enumerate(signed)) == v
        # non-adjacency: no two consecutive nonzero digits
        assert all(not (signed[i] and signed[i + 1]) for i in range(len(signed) - 1))


def test_cmp_engine():
    eng = TestEngine(P, {})
    c = BoundedComparator(eng, 16)
    assert c.is_less(3, 5) == 1
    assert c.is_less(5, 3) == 0
    assert c.is_less(5, 5) == 0
    assert c.is_less_eq(5, 5) == 1
    assert c.min_(40000, 3) == 3
    assert c.max_(40000, 3) == 40000
    assert is_equal(eng, 7, 7) == 1
    assert is_equal(eng, 7, 8) == 0


def test_cmp_compiled():
    def circuit(api):
        a = api.secret("a")
        b = api.secret("b")
        lt = api.public("lt")
        c = BoundedComparator(api, 32)
        api.assert_is_equal(c.is_less(a, b), lt)

    assert is_solved(circuit, P, {"a": 3, "b": 9, "lt": 1})
    assert not is_solved(circuit, P, {"a": 9, "b": 3, "lt": 1})

    bld = Builder(P)
    circuit(bld)
    cs = bld.compile()
    solve(cs, {"a": 3, "b": 9, "lt": 1})
    with pytest.raises(Exception):
        solve(cs, {"a": 9, "b": 3, "lt": 1})


def test_naf_compiled():
    bld = Builder(P)
    v = bld.secret("v")
    digits = gbits.to_naf(bld, v, 12)
    # recomposition already asserted inside; pin one digit as public output
    out = bld.public("d0")
    bld.assert_is_equal(digits[0], out)
    cs = bld.compile()
    solve(cs, {"v": 7, "d0": P - 1})  # NAF(7) = [-1,0,0,1]
