"""Gadget library tests (host-only: test engine + R1CS solver oracle).

Parity surface: std/hash/mimc, std/signature/eddsa, std/accumulator/merkle
(SURVEY.md §2.8); dual-interpreter strategy of §4 (engine vs compiled)."""

import pytest

from tpusnark.constraint.solver import compute_abc, solve
from tpusnark.curves import edwards
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.gadgets.eddsa import verify_eddsa
from tpusnark.gadgets.merkle import merkle_path, merkle_root, verify_merkle_proof
from tpusnark.hashes.mimc import MiMCGadget, mimc_hash
from tpusnark.testing.engine import TestEngine, is_solved

P = BN254_FR.modulus


def r1cs_is_satisfied(define_fn, assignment) -> bool:
    b = Builder(P)
    define_fn(b)
    cs = b.compile()
    try:
        W = solve(cs, assignment)
    except Exception:
        return False
    A, B, C = compute_abc(cs, W)
    return all((a * bb - c) % P == 0 for a, bb, c in zip(A, B, C))


def test_mimc_gadget_matches_native():
    msg = [7, 11, 13]
    want = mimc_hash(msg)

    def define(api):
        g = MiMCGadget(api)
        g.write(*(api.secret(f"m{i}") for i in range(3)))
        api.assert_is_equal(g.sum(), api.public("h"))

    assign = {"m0": 7, "m1": 11, "m2": 13, "h": want}
    assert is_solved(define, P, assign)
    assert not is_solved(define, P, {**assign, "h": want + 1})
    assert r1cs_is_satisfied(define, assign)


def test_eddsa_gadget():
    kp = edwards.eddsa_keygen(b"gadget-test")
    msg = 998877
    R, S = edwards.eddsa_sign(kp, msg)

    def define(api):
        verify_eddsa(
            api,
            (api.secret("rx"), api.secret("ry")),
            api.secret("s"),
            api.public("msg"),
            (api.public("ax"), api.public("ay")),
        )

    assign = {"rx": R[0], "ry": R[1], "s": S, "msg": msg, "ax": kp.pk[0], "ay": kp.pk[1]}
    assert is_solved(define, P, assign)
    assert not is_solved(define, P, {**assign, "msg": msg + 1})
    assert r1cs_is_satisfied(define, assign)


def test_merkle_gadget():
    leaves = [101, 202, 303, 404, 505, 606, 707, 808]
    root = merkle_root(leaves, P)
    idx = 5
    sibs, bits = merkle_path(leaves, idx, P)

    def define(api):
        path = [api.secret(f"p{i}") for i in range(len(sibs))]
        pbits = api.to_binary(api.secret("idx"), len(sibs))
        verify_merkle_proof(api, api.public("root"), api.secret("leaf"), path, pbits)

    assign = {"root": root, "leaf": leaves[idx], "idx": idx}
    assign.update({f"p{i}": s for i, s in enumerate(sibs)})
    assert is_solved(define, P, assign)
    assert not is_solved(define, P, {**assign, "leaf": 999})
    assert r1cs_is_satisfied(define, assign)


def test_rollup_circuit_host():
    from examples.rollup import assignment_from_transfer, define, make_test_transfer

    _, t = make_test_transfer()
    assign = assignment_from_transfer(t)
    assert is_solved(define, P, assign)
    assert not is_solved(define, P, {**assign, "amount": t["amount"] + 1})
    # full R1CS solve (30k constraints, host ints)
    assert r1cs_is_satisfied(define, assign)


def test_rollup_batch_circuit_host():
    """Batched rollup (define_batch): chained secret roots, two public
    roots for the batch (reference circuit.go BatchSizeCircuit)."""
    from functools import partial

    from examples.rollup import batch_assignment, define_batch, make_batch

    _, ts = make_batch(2, 16)
    assign = batch_assignment(ts)
    circ = partial(define_batch, batch=2, depth=4)
    assert is_solved(circ, P, assign)
    # tampering with the hidden intermediate root must fail
    assert not is_solved(circ, P, {**assign, "root_mid_0": 123})
    assert r1cs_is_satisfied(circ, assign)
