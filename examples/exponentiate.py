"""Exponentiation circuit: y == x**e with e a small public exponent proven
bit by bit (/root/reference/examples/exponentiate/exponentiate.go)."""

from __future__ import annotations

from tpusnark.backend import groth16
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder

P = BN254_FR.modulus
BITSIZE = 8


def define(api):
    x = api.public("x")
    e = api.secret("e")
    y = api.public("y")
    bits = api.to_binary(e, BITSIZE)
    output = 1
    for i in range(BITSIZE - 1, -1, -1):
        if i != BITSIZE - 1:
            output = api.mul(output, output)
        multiply = api.mul(output, x)
        output = api.select(bits[i], multiply, output)
    api.assert_is_equal(y, output)


def main():
    b = Builder(P)
    define(b)
    cs = b.compile()
    assignment = {"x": 2, "e": 12, "y": 4096}
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(cs, pk, assignment)
    assert groth16.verify(proof, vk, [assignment["x"], assignment["y"]])
    print("exponentiate: groth16 proof verified")


if __name__ == "__main__":
    main()
