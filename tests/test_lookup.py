"""Log-derivative lookup + range-check tests (VERDICT r1 #9).

Covers: std/lookup/logderivlookup (Insert/Lookup semantics + the deferred
log-derivative argument over a BSB22 commitment) and std/rangecheck
(commit-based batched range checking)."""

import pytest

from tpusnark.backend import groth16
from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.gadgets.lookup import LookupTable
from tpusnark.gadgets.rangecheck import range_checker

P = BN254_FR.modulus


def _rng(seed):
    import random

    st = random.Random(seed)
    return lambda: st.randrange(1, P)


def _prove_roundtrip(cs, assign, publics):
    pk, vk = groth16.setup(cs, rng=_rng(5))
    proof = groth16.prove(cs, pk, assign, rng=_rng(6))
    assert groth16.verify(proof, vk, publics)


def test_lookup_solves():
    b = Builder(P)
    x = b.secret("x")  # index into the table
    tbl = LookupTable(b)
    for v in (17, 23, 99, 41):
        tbl.insert(v)
    (out,) = tbl.lookup(x)
    y = b.public("y")
    b.assert_is_equal(out, y)
    cs = b.compile()
    solve(cs, {"x": 2, "y": 99})


def test_lookup_variable_entries_solves():
    b = Builder(P)
    e0 = b.secret("e0")
    tbl = LookupTable(b)
    tbl.insert(e0)
    tbl.insert(7)
    a, c = tbl.lookup(0, 1)
    b.assert_is_equal(b.add(a, c), b.public("s"))
    cs = b.compile()
    solve(cs, {"e0": 5, "s": 12})


@pytest.mark.slow
def test_lookup_groth16_prove_verify():
    """Full e2e: lookup + rangecheck circuit proves and verifies (the
    'u32-heavy circuit proves' gate from VERDICT r1 #9)."""
    b = Builder(P)
    x = b.secret("x")
    tbl = LookupTable(b)
    for v in (17, 23, 99, 41):
        tbl.insert(v)
    (out,) = tbl.lookup(x)
    rc = range_checker(b, base_bits=4)
    rc.check(out, 7)  # all table values < 128
    b.assert_is_equal(out, b.public("y"))
    cs = b.compile()
    _prove_roundtrip(cs, {"x": 2, "y": 99}, [99])


def test_lookup_out_of_range_index_fails():
    b = Builder(P)
    x = b.secret("x")
    tbl = LookupTable(b)
    tbl.insert(1)
    tbl.insert(2)
    tbl.lookup(x)
    cs = b.compile()
    with pytest.raises(ValueError):
        solve(cs, {"x": 5})


def test_lookup_forged_value_rejected():
    """A witness where the looked-up value doesn't match the table must
    violate the log-derivative identity (soundness of the argument)."""
    from tpusnark.gadgets import lookup as lk
    from tpusnark.constraint.solver import UnsatisfiedConstraintError

    b = Builder(P)
    x = b.secret("x")
    tbl = LookupTable(b)
    tbl.insert(17)
    tbl.insert(23)
    (out,) = tbl.lookup(x)
    b.assert_is_equal(out, b.public("y"))
    cs = b.compile()

    # forge: make the lookup hint lie (return 99 instead of table value)
    def lying_lookup(p, ins):
        real = lk.lookup_hint(p, ins)
        return [99 for _ in real]

    with pytest.raises((UnsatisfiedConstraintError, AssertionError)):
        W = solve(cs, {"x": 1, "y": 99}, hint_overrides={lk.lookup_hint: lying_lookup})


def test_rangecheck_valid_and_invalid():
    def build():
        b = Builder(P)
        v = b.secret("v")
        rc = range_checker(b, base_bits=4)
        rc.check(v, 10)  # v < 1024, limbs of 4 bits (non-multiple: top 2 bits)
        b.assert_is_equal(b.public("out"), b.add(v, 1))
        return b.compile()

    cs = build()
    solve(cs, {"v": 1000, "out": 1001})
    solve(cs, {"v": 555, "out": 556})
    with pytest.raises(Exception):
        solve(cs, {"v": 1024, "out": 1025})  # exactly out of range
    with pytest.raises(Exception):
        solve(cs, {"v": P - 1, "out": 0})  # wraparound attempt
