"""Keccak-f[1600] permutation gadget vs the host oracle
(std/permutation/keccakf parity, /root/reference/std/permutation/keccakf)."""

import random

from tpusnark.fields.spec import BN254_FR
from tpusnark.gadgets import uints as u
from tpusnark.gadgets.keccakf import keccak_f
from tpusnark.hashes.keccak import _keccak_f
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus


def _host_permute(words):
    a = [[words[x + 5 * y] for y in range(5)] for x in range(5)]
    _keccak_f(a)
    return [a[x][y] for y in range(5) for x in range(5)]


def _run(words):
    eng = TestEngine(P, {})
    state = [u.from_const(w, 64) for w in words]
    out = keccak_f(eng, state)
    vals = []
    for w in out:
        v = u.to_var(eng, w)
        vals.append(v if isinstance(v, int) else eng.constant_value(v))
    return vals


def test_keccakf_zero_state():
    assert _run([0] * 25) == _host_permute([0] * 25)


def test_keccakf_random_state():
    rng = random.Random(3)
    words = [rng.getrandbits(64) for _ in range(25)]
    assert _run(words) == _host_permute(words)


import pytest


@pytest.mark.slow
def test_keccakf_witness_state_solves():
    """Through the R1CS builder + solver, with witness-supplied words."""
    from tpusnark.constraint.solver import solve
    from tpusnark.frontend.builder import Builder

    rng = random.Random(5)
    words = [rng.getrandbits(64) for _ in range(25)]
    want = _host_permute(words)

    b = Builder(P)
    ins = [b.secret(f"w{i}") for i in range(25)]
    state = [u.from_var(b, v, 64) for v in ins]
    out = keccak_f(b, state)
    outs = [b.public(f"o{i}") for i in range(25)]
    for w, o in zip(out, outs):
        b.assert_is_equal(u.to_var(b, w), o)
    cs = b.compile()
    assign = {f"w{i}": words[i] for i in range(25)}
    assign.update({f"o{i}": want[i] for i in range(25)})
    W = solve(cs, assign)
    assert W is not None
