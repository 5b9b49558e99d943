"""std breadth: bitslice, multicommit, evmprecompiles, compress io
(reference /root/reference/std/math/bitslice, std/multicommit,
std/evmprecompiles, std/compress/snark_io.go)."""

import hashlib
import random

import pytest

from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.testing.engine import TestEngine

P = BN254_FR.modulus
rng = random.Random(77)


# ---------------------------------------------------------------- bitslice
def test_bitslice_partition_engine():
    from tpusnark.gadgets.bitslice import partition

    eng = TestEngine(P, {})
    for split in (1, 17, 64, 128):
        v = rng.getrandbits(200)
        lo, hi = partition(eng, eng.constant_value(v) or v, split, nbits=200)
        lo = lo if isinstance(lo, int) else eng.constant_value(lo)
        hi = hi if isinstance(hi, int) else eng.constant_value(hi)
        assert lo == v & ((1 << split) - 1)
        assert hi == v >> split


def test_bitslice_partition_r1cs():
    from tpusnark.gadgets.bitslice import partition

    b = Builder(P)
    x = b.secret("x")
    lo_p = b.public("lo")
    hi_p = b.public("hi")
    lo, hi = partition(b, x, 100, nbits=240)
    b.assert_is_equal(lo, lo_p)
    b.assert_is_equal(hi, hi_p)
    cs = b.compile()
    v = rng.getrandbits(240)
    W = solve(cs, {"x": v, "lo": v & ((1 << 100) - 1), "hi": v >> 100})
    assert W is not None


# -------------------------------------------------------------- multicommit
def test_multicommit_two_callbacks_unique():
    """Two gadgets get DISTINCT derived commitments from one api.commit."""
    from tpusnark.gadgets.multicommit import with_commitment

    b = Builder(P)
    x = b.secret("x")
    y = b.secret("y")
    got = {}
    with_commitment(b, lambda api, c: got.__setitem__("a", c), x)
    with_commitment(b, lambda api, c: got.__setitem__("b", c), y)
    # bind the derived challenges into the circuit so they are solved
    outs = {}
    b.defer_(
        lambda api: outs.update(
            a=api.mul(got["a"], 1), b=api.mul(got["b"], 1)
        )
    )
    cs = b.compile()
    assert len(cs.commitments) == 1  # ONE underlying commitment
    W = solve(cs, {"x": 5, "y": 7})
    assert W is not None


# ----------------------------------------------------------- evmprecompiles
def test_evm_identity_and_expmod():
    from tpusnark.gadgets.evmprecompiles import expmod, identity

    eng = TestEngine(P, {})
    assert identity(eng, [1, 2, 3]) == [1, 2, 3]

    mod = 0xFFFFFFFB  # prime
    from tpusnark.gadgets.emulated import EmuParams

    prm = EmuParams.for_modulus(mod, 64)
    base = rng.randrange(1, mod)
    exp = rng.getrandbits(16)
    bits = [(exp >> i) & 1 for i in range(16)]
    out = expmod(eng, prm.decompose(base), bits, mod)
    from tpusnark.gadgets.emulated import EmulatedField

    F = EmulatedField(eng, prm)
    assert F.to_value(F.reduce(out)) == pow(base, exp, mod)


@pytest.mark.slow
def test_evm_ecrecover():
    """ecrecover recovers the signing key of a from-scratch ECDSA signature."""
    from tpusnark.gadgets.evmprecompiles import ecrecover
    from tpusnark.gadgets.emulated import EmuParams
    from tpusnark.gadgets.sw_emulated import SECP256K1 as C

    # host-side sign (same oracle as test_sw_emulated)
    def _add(P1, P2):
        p = C.p
        if P1 is None:
            return P2
        if P2 is None:
            return P1
        x1, y1 = P1
        x2, y2 = P2
        if x1 == x2 and (y1 + y2) % p == 0:
            return None
        if P1 == P2:
            lam = (3 * x1 * x1) * pow(2 * y1, p - 2, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return x3, (lam * (x1 - x3) - y1) % p

    def _smul(k, pt):
        acc = None
        while k:
            if k & 1:
                acc = _add(acc, pt)
            pt = _add(pt, pt)
            k >>= 1
        return acc

    gen = (C.gx, C.gy)
    priv = rng.randrange(1, C.order)
    pub = _smul(priv, gen)
    h = int.from_bytes(hashlib.sha256(b"evm ecrecover").digest(), "big") % C.order
    while True:
        k = rng.randrange(1, C.order)
        R = _smul(k, gen)
        r = R[0] % C.order
        if r == 0 or R[0] >= C.order:
            continue
        s = pow(k, -1, C.order) * (h + r * priv) % C.order
        if s:
            break
    v = R[1] & 1

    eng = TestEngine(P, {})
    prm = EmuParams.for_modulus(C.order, 64)
    Q = ecrecover(eng, prm.decompose(h), v, prm.decompose(r), prm.decompose(s))
    from tpusnark.gadgets.emulated import EmulatedField

    Fp = EmulatedField(eng, EmuParams.for_modulus(C.p, 64))
    assert Fp.to_value(Fp.reduce(Q.x)) == pub[0]
    assert Fp.to_value(Fp.reduce(Q.y)) == pub[1]
