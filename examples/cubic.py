"""Cubic circuit: prove knowledge of x with x**3 + x + 5 == y.

The gnark hello-world (/root/reference/examples/cubic/cubic.go), Groth16
over BN254. Run: python -m examples.cubic
"""

from __future__ import annotations

from tpusnark.backend import groth16
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder

P = BN254_FR.modulus


def define(api, x=None, y=None):
    """Circuit body, usable with a Builder or the TestEngine."""
    x = x if x is not None else api.secret("x")
    y = y if y is not None else api.public("y")
    x3 = api.mul(x, x, x)
    api.assert_is_equal(api.add(x3, x, 5), y)


def compile_circuit():
    b = Builder(P)
    define(b)
    return b.compile()


def main():
    cs = compile_circuit()
    assignment = {"x": 3, "y": 35}
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(cs, pk, assignment)
    assert groth16.verify(proof, vk, [assignment["y"]])
    print("cubic: groth16 proof verified")


if __name__ == "__main__":
    main()
