"""Fiat-Shamir transcript byte-exactness fixtures.

The expected digests below are hand-derived from gnark-crypto's
fiatshamir.Transcript algorithm (the dependency of
/root/reference/backend/plonk/bn254/prove.go:243):

    value(c_i) = SHA256( name(c_i) || value(c_{i-1}) || bindings(c_i) )

with raw concatenated bindings (no length framing) and the first challenge
omitting the previous-value term. These fixtures pin OUR implementation to
that algorithm — any accidental reordering or framing change breaks them.
"""

import hashlib

from tpusnark.utils.transcript import Transcript, fr_bytes, g1_bytes, kzg_fold_challenge

R = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def test_first_challenge_is_name_plus_bindings():
    tr = Transcript(["gamma", "beta"])
    tr.bind("gamma", b"\x01\x02")
    tr.bind("gamma", b"\x03")
    want = hashlib.sha256(b"gamma" + b"\x01\x02\x03").digest()
    assert tr.compute("gamma") == want


def test_chained_challenge_hashes_previous_value():
    tr = Transcript(["gamma", "beta", "alpha"])
    tr.bind("gamma", b"pub")
    g = hashlib.sha256(b"gamma" + b"pub").digest()
    b = hashlib.sha256(b"beta" + g).digest()  # beta: no bindings, prev chained
    tr.bind("alpha", b"zc")
    a = hashlib.sha256(b"alpha" + b + b"zc").digest()
    assert tr.compute("beta") == b
    assert tr.compute("alpha") == a
    assert tr.challenge_int("alpha", R) == int.from_bytes(a, "big") % R


def test_binding_is_concatenation_not_framed():
    """gnark appends bindings into one buffer: bind(x) ; bind(y) must hash
    identically to bind(x || y)."""
    t1 = Transcript(["c"])
    t1.bind("c", b"ab")
    t1.bind("c", b"cd")
    t2 = Transcript(["c"])
    t2.bind("c", b"abcd")
    assert t1.compute("c") == t2.compute("c")


def test_bind_after_compute_rejected():
    tr = Transcript(["c"])
    tr.compute("c")
    try:
        tr.bind("c", b"late")
    except AssertionError:
        return
    raise AssertionError("bind after compute must fail")


def test_fr_and_g1_marshal_layout():
    assert fr_bytes(1) == b"\x00" * 31 + b"\x01"
    assert len(fr_bytes(R - 1)) == 32
    # gnark G1Affine.Marshal(): X||Y uncompressed big-endian, flags 0b00;
    # infinity = 64 zero bytes (gnark-crypto v0.12 bn254 RawBytes)
    from tpusnark.curves.ref import G1

    gx, gy = G1.generator()
    enc = g1_bytes((gx, gy))
    assert enc == int(gx).to_bytes(32, "big") + int(gy).to_bytes(32, "big")
    assert enc[0] >> 6 == 0
    assert g1_bytes(None) == b"\x00" * 64


def test_kzg_fold_challenge_fixture():
    """gnark-crypto kzg.deriveGamma: fresh one-challenge transcript 'gamma'
    binding point.Marshal() || digests...Marshal() || claimed...Marshal() ||
    extra data, single SHA-256, big-endian mod r."""
    from tpusnark.curves.ref import G1

    g = G1.generator()
    point, v0, v1 = 5, 7, 9
    extra = fr_bytes(11)
    got = kzg_fold_challenge(point, [g, None], [v0, v1], [extra], R)
    h = hashlib.sha256()
    h.update(b"gamma")
    h.update(fr_bytes(point))
    h.update(g1_bytes(g))
    h.update(b"\x00" * 64)
    h.update(fr_bytes(v0))
    h.update(fr_bytes(v1))
    h.update(extra)
    assert got == int.from_bytes(h.digest(), "big") % R
