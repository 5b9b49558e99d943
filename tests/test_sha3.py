"""SHA3 / legacy-Keccak sponge gadget vs host oracle and hashlib
(std/hash/sha3 parity, /root/reference/std/hash/sha3/sha3.go:17-90)."""

import hashlib
import random

import pytest

from tpusnark.fields.spec import BN254_FR
from tpusnark.gadgets import sha3 as g
from tpusnark.gadgets import uints as u
from tpusnark.hashes import keccak as hk
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus


def _run(variant, data: bytes):
    eng = TestEngine(P, {})
    out = g.sponge(eng, [int(b) for b in data], variant)
    vals = []
    for v in out:
        vals.append(v if isinstance(v, int) else eng.constant_value(v))
    return bytes(vals)


def test_host_oracle_vs_hashlib():
    """The host sponge against python hashlib (externally-produced truth)."""
    rng = random.Random(1)
    for n in (0, 1, 31, 135, 136, 137, 300):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert hk.sha3_256(data) == hashlib.sha3_256(data).digest()
        assert hk.sha3_512(data) == hashlib.sha3_512(data).digest()
        assert hk.sha3_384(data) == hashlib.sha3_384(data).digest()
        assert hk.keccak256(data) == hk.sponge(data, 136, 0x01, 32)


@pytest.mark.parametrize(
    "variant,href",
    [
        ("sha3-256", lambda d: hashlib.sha3_256(d).digest()),
        ("sha3-512", lambda d: hashlib.sha3_512(d).digest()),
        ("keccak-256", hk.keccak256),
    ],
)
def test_sponge_gadget(variant, href):
    rng = random.Random(7)
    for n in (0, 3, 71, 72, 140):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert _run(variant, data) == href(data)


@pytest.mark.slow
def test_sha3_witness_solves():
    """Through the R1CS builder + solver with witness-supplied bytes."""
    from tpusnark.constraint.solver import solve
    from tpusnark.frontend.builder import Builder

    rng = random.Random(9)
    data = bytes(rng.randrange(256) for _ in range(11))
    want = hashlib.sha3_256(data).digest()

    b = Builder(P)
    ins = [b.secret(f"m{i}") for i in range(len(data))]
    out = g.sha3_256(b, ins)
    outs = [b.public(f"o{i}") for i in range(32)]
    for w, o in zip(out, outs):
        b.assert_is_equal(w, o)
    cs = b.compile()
    assign = {f"m{i}": data[i] for i in range(len(data))}
    assign.update({f"o{i}": want[i] for i in range(32)})
    W = solve(cs, assign)
    assert W is not None
