"""Sumcheck + GKR protocol tests: host prover/verifier round trips, tampering
negatives, and the in-circuit verifier through the engine + compiled R1CS.

Reference parity: /root/reference/std/sumcheck/sumcheck.go,
/root/reference/std/gkr/{api.go,compile.go}, constraint/gkr.go:18-42.
"""

import random

import pytest

from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.protocols import gkr, sumcheck
from tpusnark.protocols.multilinear import MultiLin, eq_table
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus
rng = random.Random(7)


def _rand_mlin(n_vars):
    return MultiLin([rng.randrange(P) for _ in range(1 << n_vars)], P)


# ------------------------------------------------------------- multilinear
def test_multilinear_eval_matches_direct():
    f = _rand_mlin(3)
    # evaluating at a boolean point must return the table entry
    for idx in range(8):
        pt = [(idx >> j) & 1 for j in range(3)]
        assert f.evaluate(pt) == f.e[idx]
    # eq table against evaluate
    pt = [rng.randrange(P) for _ in range(3)]
    assert sum(t * v for t, v in zip(eq_table(pt, P).e, f.e)) % P == f.evaluate(pt)


# ---------------------------------------------------------------- sumcheck
def test_sumcheck_roundtrip():
    f, g = _rand_mlin(4), _rand_mlin(4)
    claim = sum(a * b for a, b in zip(f.e, g.e)) % P
    proof = sumcheck.prove([f, g], claim, P)
    point = sumcheck.verify(claim, proof, 4, P)
    # oracle check of the prover's final factor evaluations
    assert proof.final_evals[0][0] == f.evaluate(point)
    assert proof.final_evals[0][1] == g.evaluate(point)


def test_sumcheck_rejects_wrong_claim():
    f = _rand_mlin(3)
    claim = sum(f.e) % P
    proof = sumcheck.prove([f], claim, P)
    with pytest.raises(ValueError):
        sumcheck.verify((claim + 1) % P, proof, 3, P)


def test_sumcheck_rejects_tampered_round():
    f, g = _rand_mlin(3), _rand_mlin(3)
    claim = sum(a * b for a, b in zip(f.e, g.e)) % P
    proof = sumcheck.prove([f, g], claim, P)
    proof.rounds[1][0] = (proof.rounds[1][0] + 1) % P
    with pytest.raises(ValueError):
        sumcheck.verify(claim, proof, 3, P)


def test_sumcheck_in_circuit_engine():
    f, g = _rand_mlin(3), _rand_mlin(3)
    claim = sum(a * b for a, b in zip(f.e, g.e)) % P
    proof = sumcheck.prove([f, g], claim, P)
    eng = TestEngine(P, {})
    point = sumcheck.verify_in_circuit(eng, claim, proof.rounds,
                                       proof.final_evals[0], 3)
    assert point == sumcheck.verify(claim, proof, 3, P)


# --------------------------------------------------------------------- GKR
def _mk_circuit():
    """2 layers: inputs (4) -> hidden (4 gates) -> outputs (2 gates)."""
    hidden = [
        gkr.Gate(gkr.MUL, 0, 1),
        gkr.Gate(gkr.ADD, 1, 2),
        gkr.Gate(gkr.MUL, 2, 3),
        gkr.Gate(gkr.ADD, 3, 0),
    ]
    out = [gkr.Gate(gkr.ADD, 0, 1), gkr.Gate(gkr.MUL, 2, 3)]
    return gkr.LayeredCircuit([out, hidden], n_inputs=4)


def test_gkr_evaluate():
    c = _mk_circuit()
    ins = [3, 5, 7, 11]
    vals = c.evaluate(ins, P)
    assert vals[1] == [15, 12, 77, 14]
    assert vals[0] == [27, 77 * 14]


def test_gkr_roundtrip():
    c = _mk_circuit()
    ins = [rng.randrange(P) for _ in range(4)]
    outs, proof = gkr.prove(c, ins, P)
    assert gkr.verify(c, ins, outs, proof, P)


def test_gkr_rejects_wrong_output():
    c = _mk_circuit()
    ins = [rng.randrange(P) for _ in range(4)]
    outs, proof = gkr.prove(c, ins, P)
    bad = list(outs)
    bad[0] = (bad[0] + 1) % P
    with pytest.raises(ValueError):
        gkr.verify(c, ins, bad, proof, P)


def test_gkr_rejects_tampered_claim():
    c = _mk_circuit()
    ins = [rng.randrange(P) for _ in range(4)]
    outs, proof = gkr.prove(c, ins, P)
    proof.layers[0].wu = (proof.layers[0].wu + 1) % P
    with pytest.raises(ValueError):
        gkr.verify(c, ins, outs, proof, P)


def test_gkr_deeper_circuit():
    """3 layers, widths 8 -> 8 -> 2; mixed ops."""
    l2 = [gkr.Gate(gkr.MUL, i, (i + 1) % 8) for i in range(8)]
    l1 = [gkr.Gate(gkr.ADD, i, (i + 3) % 8) for i in range(8)]
    l0 = [gkr.Gate(gkr.MUL, 0, 4), gkr.Gate(gkr.ADD, 2, 6)]
    c = gkr.LayeredCircuit([l0, l1, l2], n_inputs=8)
    ins = [rng.randrange(P) for _ in range(8)]
    outs, proof = gkr.prove(c, ins, P)
    assert gkr.verify(c, ins, outs, proof, P)


def test_gkr_in_circuit_engine():
    c = _mk_circuit()
    ins = [rng.randrange(P) for _ in range(4)]
    outs, proof = gkr.prove(c, ins, P)
    eng = TestEngine(P, {})
    assert gkr.verify_in_circuit(eng, c, ins, outs, proof)


def test_gkr_in_circuit_compiled():
    """The verifier gadget compiled to R1CS and solved; wrong outputs fail."""
    c = _mk_circuit()
    ins = [17, 23, 29, 31]
    outs, proof = gkr.prove(c, ins, P)

    b = Builder(P)
    in_vars = [b.secret(f"x{i}") for i in range(4)]
    out_vars = [b.public(f"y{i}") for i in range(2)]
    gkr.verify_in_circuit(b, c, in_vars, out_vars, proof)
    cs = b.compile()

    good = {f"x{i}": v for i, v in enumerate(ins)}
    good.update({f"y{i}": v for i, v in enumerate(outs)})
    solve(cs, good)

    bad = dict(good, y0=(outs[0] + 1) % P)
    with pytest.raises(Exception):
        solve(cs, bad)
