"""MiMC preimage circuit: prove knowledge of m with MiMC(m) == h
(/root/reference/examples/mimc/mimc.go)."""

from __future__ import annotations

from tpusnark.backend import groth16
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.hashes.mimc import MiMCGadget, mimc_hash

P = BN254_FR.modulus


def define(api):
    pre = api.secret("pre_image")
    h = api.public("hash")
    g = MiMCGadget(api)
    g.write(pre)
    api.assert_is_equal(g.sum(), h)


def main():
    b = Builder(P)
    define(b)
    cs = b.compile()
    pre = 0xDEADF00D
    assignment = {"pre_image": pre, "hash": mimc_hash([pre])}
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(cs, pk, assignment)
    assert groth16.verify(proof, vk, [assignment["hash"]])
    print("mimc: groth16 proof verified")


if __name__ == "__main__":
    main()
