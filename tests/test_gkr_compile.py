"""CS-embedded GKR (std/gkr compile API analog, reference
std/gkr/compile.go:16-45): DAG -> layered layout -> prover hint ->
in-circuit verifier, through the R1CS builder and the host solver."""

import random

import pytest

from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.gadgets.gkr_compile import GkrApi

P = BN254_FR.modulus


def _build(n_inst, a_vals, b_vals):
    """Per instance: out = (a*b + a) * b, plus a second output a + b."""
    b = Builder(P)
    a_vars = [b.secret(f"a{i}") for i in range(n_inst)]
    b_vars = [b.secret(f"b{i}") for i in range(n_inst)]

    g = GkrApi()
    wa = g.import_input(a_vars)
    wb = g.import_input(b_vars)
    wc = g.mul(wa, wb)
    wd = g.add(wc, wa)
    we = g.mul(wd, wb)
    ws = g.add(wa, wb)
    g.output(we)
    g.output(ws)
    outs = g.finalize(b)

    pubs = []
    for i in range(n_inst):
        o1 = b.public(f"o{i}")
        o2 = b.public(f"s{i}")
        b.assert_is_equal(outs[we][i], o1)
        b.assert_is_equal(outs[ws][i], o2)
        pubs.append((o1, o2))
    cs = b.compile()

    assign = {}
    for i in range(n_inst):
        assign[f"a{i}"] = a_vals[i]
        assign[f"b{i}"] = b_vals[i]
        assign[f"o{i}"] = ((a_vals[i] * b_vals[i] + a_vals[i]) * b_vals[i]) % P
        assign[f"s{i}"] = (a_vals[i] + b_vals[i]) % P
    return cs, assign


@pytest.mark.parametrize("n_inst", [2, 4])
def test_gkr_compile_solves(n_inst):
    rng = random.Random(11)
    a_vals = [rng.randrange(P) for _ in range(n_inst)]
    b_vals = [rng.randrange(P) for _ in range(n_inst)]
    cs, assign = _build(n_inst, a_vals, b_vals)
    W = solve(cs, assign)
    assert W is not None


def test_gkr_compile_rejects_wrong_output():
    cs, assign = _build(2, [3, 5], [7, 11])
    assign["o0"] = (assign["o0"] + 1) % P
    with pytest.raises(Exception):
        W = solve(cs, assign)
        assert W is None
