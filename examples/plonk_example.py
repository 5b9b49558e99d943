"""PLONK example: the cubic circuit over the Plonkish constraint system
(/root/reference/examples/plonk/main.go:30-40)."""

from __future__ import annotations

from tpusnark.backend import plonk
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.plonk_builder import PlonkBuilder

P = BN254_FR.modulus


def main():
    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    x3 = b.mul(x, x, x)
    b.assert_is_equal(b.add(x3, x, 5), y)
    cs = b.compile()
    pk, vk = plonk.setup(cs)
    proof = plonk.prove(cs, pk, {"x": 3, "y": 35})
    assert plonk.verify(proof, vk, [35])
    print("plonk: proof verified")


if __name__ == "__main__":
    main()
