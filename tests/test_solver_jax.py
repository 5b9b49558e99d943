"""Device (level-parallel) solver vs the host Python oracle solver.

Reference behavior being matched: /root/reference/constraint/bn254/solver.go
(level worker pool, one-unknown R1C solving, hint execution, zero-denominator
convention, unsatisfied-constraint errors)."""

import numpy as np
import pytest

from tpusnark.constraint.solver import UnsatisfiedConstraintError, solve
from tpusnark.constraint.solver_jax import solve_jax_ints
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder

P = BN254_FR.modulus


def _eq(cs, assignment):
    want = solve(cs, assignment)
    got = solve_jax_ints(cs, assignment, BN254_FR)
    assert got == want


def test_mul_chain():
    b = Builder(P)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for _ in range(10):
        acc = b.mul(acc, x)
    b.assert_is_equal(b.add(acc, x, 5), y)
    cs = b.compile()
    _eq(cs, {"x": 3, "y": (pow(3, 11, P) + 3 + 5) % P})


@pytest.mark.slow
def test_wide_level():
    """Many independent products: one fat level exercising vectorization."""
    b = Builder(P)
    xs = [b.secret(f"x{i}") for i in range(32)]
    outs = [b.mul(xs[i], xs[(i + 1) % 32]) for i in range(32)]
    total = b.add(outs[0], outs[1], *outs[2:])
    y = b.public("y")
    b.assert_is_equal(total, y)
    cs = b.compile()
    vals = {f"x{i}": i + 2 for i in range(32)}
    tot = sum((i + 2) * ((i + 1) % 32 + 2) for i in range(32)) % P
    _eq(cs, dict(vals, y=tot))


@pytest.mark.slow
def test_division_and_inverse():
    """Unknown-in-R (div) and unknown-in-L paths incl. batched Fermat inv."""
    b = Builder(P)
    x = b.secret("x")
    z = b.secret("z")
    d = b.div(x, z)
    inv = b.inverse(b.add(x, 1))
    y = b.public("y")
    b.assert_is_equal(b.add(d, inv), y)
    cs = b.compile()
    xv, zv = 10, 7
    yv = (xv * pow(zv, -1, P) + pow(xv + 1, -1, P)) % P
    _eq(cs, {"x": xv, "z": zv, "y": yv})


def test_hints_and_bits():
    b = Builder(P)
    x = b.secret("x")
    bits = b.to_binary(x, 16)
    y = b.public("y")
    b.assert_is_equal(b.from_binary(bits[:8]), y)
    cs = b.compile()
    _eq(cs, {"x": 0xABCD, "y": 0xCD})


def test_is_zero_branches():
    b = Builder(P)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.is_zero(x), y)
    cs = b.compile()
    _eq(cs, {"x": 0, "y": 1})
    _eq(cs, {"x": 5, "y": 0})


def test_unsatisfied_raises():
    b = Builder(P)
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.mul(x, x), y)
    cs = b.compile()
    with pytest.raises(UnsatisfiedConstraintError):
        solve_jax_ints(cs, {"x": 3, "y": 10}, BN254_FR)


@pytest.mark.slow
def test_gadget_circuit():
    """MiMC gadget: deeper mixed constraint structure (91 sequential rounds
    x a couple of parallel instances)."""
    from tpusnark.hashes.mimc import MiMCGadget, mimc_hash

    b = Builder(P)
    xs = [b.secret(f"x{i}") for i in range(4)]
    y = b.public("y")
    digs = []
    for x in xs:
        g = MiMCGadget(b)
        g.write(x)
        digs.append(g.sum())
    b.assert_is_equal(b.add(digs[0], digs[1], *digs[2:]), y)
    cs = b.compile()
    vals = {f"x{i}": 100 + i for i in range(4)}
    yv = sum(mimc_hash([100 + i]) for i in range(4)) % P
    _eq(cs, dict(vals, y=yv))
