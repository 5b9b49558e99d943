"""Constraint-system serialization round-trips (gnark CBOR analog,
/root/reference/constraint/bn254/system.go:149-160; io/roundtrip.go)."""

from tpusnark.constraint.serialize import dump, load
from tpusnark.constraint.solver import solve
from tpusnark.constraint.scs import solve_scs
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.frontend.plonk_builder import PlonkBuilder

P = BN254_FR.modulus


def _r1cs_circuit():
    b = Builder(P)
    x = b.secret("x")
    y = b.public("y")
    bits = b.to_binary(x, 8)
    even = b.is_zero(bits[0])
    b.assert_is_equal(b.add(b.mul(x, x), even), y)
    return b.compile()


def test_r1cs_roundtrip():
    cs = _r1cs_circuit()
    cs2 = load(dump(cs))
    assign = {"x": 6, "y": 37}
    assert solve(cs, assign) == solve(cs2, assign)
    assert cs2.stats() == cs.stats()


def test_scs_roundtrip():
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    bits = b.to_binary(x, 8)
    even = b.is_zero(bits[0])
    b.assert_is_equal(b.add(b.mul(x, x), even), y)
    cs = b.compile()
    cs2 = load(dump(cs))
    assign = {"x": 6, "y": 37}
    assert solve_scs(cs, assign) == solve_scs(cs2, assign)
    assert cs2.stats() == cs.stats()
