"""Toy zk-rollup: an operator proves it processed a batch of transfers.

Mirrors /root/reference/examples/rollup/circuit.go:28-67 + operator.go:
accounts in a MiMC Merkle tree; per transfer the circuit checks the
sender/receiver inclusion proofs against the pre-state root, the sender's
EdDSA signature over the transfer, balance/nonce updates, and the inclusion
proofs of the updated leaves against the post-state root.

Run the full proof (TPU-sized): python -m examples.rollup
The circuit builder + host operator are imported by tests (host-only).
"""

from __future__ import annotations

from dataclasses import dataclass

from tpusnark.curves import edwards
from tpusnark.fields.spec import BN254_FR
from tpusnark.gadgets.eddsa import verify_eddsa
from tpusnark.gadgets.merkle import merkle_path, merkle_root, verify_merkle_proof
from tpusnark.hashes.mimc import MiMCGadget, mimc_hash

P = BN254_FR.modulus

N_ACCOUNTS = 16
DEPTH = 4  # log2(N_ACCOUNTS)
BATCH_SIZE = 1


# --------------------------------------------------------------------- state
@dataclass
class Account:
    index: int
    nonce: int
    balance: int
    pub: tuple  # twisted Edwards point

    def leaf_hash(self) -> int:
        return mimc_hash([self.index, self.nonce, self.balance, self.pub[0], self.pub[1]])


def transfer_digest(nonce, amount, sender_pub, receiver_pub) -> int:
    return mimc_hash(
        [nonce, amount, sender_pub[0], sender_pub[1], receiver_pub[0], receiver_pub[1]]
    )


class Operator:
    """Host-side rollup state machine (reference operator.go)."""

    def __init__(self, keypairs):
        self.keypairs = keypairs
        self.accounts = [
            Account(index=i, nonce=0, balance=1_000_000, pub=kp.pk)
            for i, kp in enumerate(keypairs)
        ]

    def leaves(self):
        return [a.leaf_hash() for a in self.accounts]

    def root(self) -> int:
        return merkle_root(self.leaves(), P)

    def make_transfer(self, sender: int, receiver: int, amount: int):
        """Sign + apply one transfer; returns the witness data the circuit
        needs (pre/post accounts, merkle paths, signature, roots)."""
        snd, rcv = self.accounts[sender], self.accounts[receiver]
        digest = transfer_digest(snd.nonce, amount, snd.pub, rcv.pub)
        sig_r, sig_s = edwards.eddsa_sign(self.keypairs[sender], digest)

        leaves_before = self.leaves()
        root_before = merkle_root(leaves_before, P)
        snd_path_before = merkle_path(leaves_before, sender, P)
        rcv_path_before = merkle_path(leaves_before, receiver, P)
        pre = {
            "sender": dataclasses_copy(snd),
            "receiver": dataclasses_copy(rcv),
        }

        # state transition
        assert amount <= snd.balance
        snd.balance -= amount
        snd.nonce += 1
        rcv.balance += amount

        leaves_after = self.leaves()
        root_after = merkle_root(leaves_after, P)
        snd_path_after = merkle_path(leaves_after, sender, P)
        rcv_path_after = merkle_path(leaves_after, receiver, P)

        return {
            "pre": pre,
            "post": {
                "sender": dataclasses_copy(self.accounts[sender]),
                "receiver": dataclasses_copy(self.accounts[receiver]),
            },
            "amount": amount,
            "sig_r": sig_r,
            "sig_s": sig_s,
            "root_before": root_before,
            "root_after": root_after,
            "paths": {
                "sender_before": snd_path_before,
                "receiver_before": rcv_path_before,
                "sender_after": snd_path_after,
                "receiver_after": rcv_path_after,
            },
        }


def dataclasses_copy(a: Account) -> Account:
    return Account(a.index, a.nonce, a.balance, a.pub)


# -------------------------------------------------------------------- circuit
def _account_inputs(api, name: str):
    return {
        "index": api.secret(f"{name}_index"),
        "nonce": api.secret(f"{name}_nonce"),
        "balance": api.secret(f"{name}_balance"),
        "pub_x": api.secret(f"{name}_pub_x"),
        "pub_y": api.secret(f"{name}_pub_y"),
    }


def _leaf_hash_gadget(api, acc):
    h = MiMCGadget(api)
    h.write(acc["index"], acc["nonce"], acc["balance"], acc["pub_x"], acc["pub_y"])
    return h.sum()


def define(api):
    """Builds the batch-1 rollup circuit. Input names are flat secrets plus
    public root_before / root_after."""
    root_before = api.public("root_before")
    root_after = api.public("root_after")

    snd_b = _account_inputs(api, "sender_before")
    rcv_b = _account_inputs(api, "receiver_before")
    snd_a = _account_inputs(api, "sender_after")
    rcv_a = _account_inputs(api, "receiver_after")
    amount = api.secret("amount")
    sig_rx = api.secret("sig_rx")
    sig_ry = api.secret("sig_ry")
    sig_s = api.secret("sig_s")
    paths = {
        key: [api.secret(f"path_{key}_{i}") for i in range(DEPTH)]
        for key in ("sender_before", "receiver_before", "sender_after", "receiver_after")
    }

    # same keys and indices before/after
    for k in ("index", "pub_x", "pub_y"):
        api.assert_is_equal(snd_b[k], snd_a[k])
        api.assert_is_equal(rcv_b[k], rcv_a[k])

    # inclusion proofs (index bits select sibling order)
    snd_bits = api.to_binary(snd_b["index"], DEPTH)
    rcv_bits = api.to_binary(rcv_b["index"], DEPTH)
    verify_merkle_proof(api, root_before, _leaf_hash_gadget(api, snd_b),
                        paths["sender_before"], snd_bits)
    verify_merkle_proof(api, root_before, _leaf_hash_gadget(api, rcv_b),
                        paths["receiver_before"], rcv_bits)
    verify_merkle_proof(api, root_after, _leaf_hash_gadget(api, snd_a),
                        paths["sender_after"], snd_bits)
    verify_merkle_proof(api, root_after, _leaf_hash_gadget(api, rcv_a),
                        paths["receiver_after"], rcv_bits)

    # signature over h(nonce | amount | senderPub | receiverPub)
    h = MiMCGadget(api)
    h.write(snd_b["nonce"], amount, snd_b["pub_x"], snd_b["pub_y"],
            rcv_b["pub_x"], rcv_b["pub_y"])
    digest = h.sum()
    verify_eddsa(api, (sig_rx, sig_ry), sig_s, digest, (snd_b["pub_x"], snd_b["pub_y"]))

    # balance / nonce transitions (circuit.go verifyAccountUpdated)
    api.assert_is_equal(api.add(snd_b["nonce"], 1), snd_a["nonce"])
    api.assert_is_equal(rcv_b["nonce"], rcv_a["nonce"])
    api.assert_is_less_or_equal(amount, snd_b["balance"], nbits=64)
    api.assert_is_equal(api.sub(snd_b["balance"], amount), snd_a["balance"])
    api.assert_is_equal(api.add(rcv_b["balance"], amount), rcv_a["balance"])


def assignment_from_transfer(t: dict) -> dict:
    out = {
        "root_before": t["root_before"],
        "root_after": t["root_after"],
        "amount": t["amount"],
        "sig_rx": t["sig_r"][0],
        "sig_ry": t["sig_r"][1],
        "sig_s": t["sig_s"],
    }
    for role, acc in (
        ("sender_before", t["pre"]["sender"]),
        ("receiver_before", t["pre"]["receiver"]),
        ("sender_after", t["post"]["sender"]),
        ("receiver_after", t["post"]["receiver"]),
    ):
        out[f"{role}_index"] = acc.index
        out[f"{role}_nonce"] = acc.nonce
        out[f"{role}_balance"] = acc.balance
        out[f"{role}_pub_x"] = acc.pub[0]
        out[f"{role}_pub_y"] = acc.pub[1]
    for key, (sibs, _bits) in t["paths"].items():
        for i, s in enumerate(sibs):
            out[f"path_{key}_{i}"] = s
    return out


def make_test_transfer():
    kps = [edwards.eddsa_keygen(bytes([i])) for i in range(N_ACCOUNTS)]
    op = Operator(kps)
    t = op.make_transfer(sender=1, receiver=3, amount=42)
    return op, t


def main():
    from tpusnark.backend import groth16
    from tpusnark.frontend.builder import Builder
    from tpusnark.logger import phase

    b = Builder(P)
    define(b)
    cs = b.compile()
    print("rollup cs:", cs.stats())
    _, t = make_test_transfer()
    assign = assignment_from_transfer(t)
    with phase("setup", n=cs.stats()["n_constraints"]):
        pk, vk = groth16.setup(cs)
    with phase("prove"):
        proof = groth16.prove(cs, pk, assign)
    assert groth16.verify(proof, vk, [t["root_before"], t["root_after"]])
    print("rollup: groth16 proof verified")


if __name__ == "__main__":
    main()
