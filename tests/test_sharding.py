"""Direct tests for the multi-chip sharded kernels on the 8-device CPU mesh.

Covers (VERDICT r1 #1): ShardedMSM and ShardedNTT against their single-chip
counterparts, and the full sharded Groth16 prove against the host pairing
verifier. Reference shape being validated: the accelerator-offload prover
/root/reference/backend/groth16/bn254/icicle/icicle.go:133-422, re-expressed
as mesh-sharded XLA programs (SURVEY.md §2.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusnark.curves import ref as cr
from tpusnark.curves.encoding import g1_from_device_proj, g1_to_device
from tpusnark.fields.jfield import get_field
from tpusnark.fields.spec import BN254_FR
from tpusnark.msm.pippenger import get_msm, msm_naive_ref
from tpusnark.parallel.sharding import ShardedMSM, ShardedNTT
from tpusnark.poly.ntt import get_ntt

fr = get_field(BN254_FR)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.sharding.Mesh(np.array(devs[:8]), ("data",))


def _points(n, seed=3):
    rng = np.random.default_rng(seed)
    base = cr.G1.generator()
    pts, P = [], base
    for _ in range(n):
        pts.append(P)
        P = cr.G1.add(P, base)
    scal = [int.from_bytes(rng.bytes(31), "little") % BN254_FR.modulus for _ in range(n)]
    return pts, scal


def test_sharded_msm_matches_oracle(mesh):
    n = 64
    pts, scal = _points(n)
    msm = get_msm("g1", c=4)
    smsm = ShardedMSM(msm, mesh, "data")
    dev_pts = smsm.shard_points(g1_to_device(pts))
    sc = jnp.asarray(BN254_FR.encode(scal, mont=False).T.copy())
    out = smsm(dev_pts, sc)
    (got,) = g1_from_device_proj(out)
    assert got == msm_naive_ref(pts, scal)


@pytest.mark.slow
def test_sharded_msm_matches_single_chip(mesh):
    n = 128
    pts, scal = _points(n, seed=4)
    msm = get_msm("g1", c=5)
    dev = g1_to_device(pts)
    sc = jnp.asarray(BN254_FR.encode(scal, mont=False).T.copy())
    (single,) = g1_from_device_proj(msm(dev, sc))
    smsm = ShardedMSM(msm, mesh, "data")
    (sharded,) = g1_from_device_proj(smsm(smsm.shard_points(dev), sc))
    assert single == sharded


def test_sharded_ntt_matches_single(mesh):
    n = 256
    sntt = ShardedNTT(BN254_FR, n, mesh, "data")
    ntt = get_ntt(BN254_FR, n)
    rng = np.random.default_rng(5)
    vals = [int.from_bytes(rng.bytes(31), "little") % BN254_FR.modulus for _ in range(n)]
    x = fr.array(vals)
    got = np.asarray(fr.canon(sntt.ntt(x)))
    want = np.asarray(fr.canon(ntt.ntt(x)))
    assert np.array_equal(got, want)
    back = np.asarray(fr.canon(sntt.intt(sntt.ntt(x))))
    orig = np.asarray(fr.canon(x))
    assert np.array_equal(back, orig)


def test_sharded_ntt_coset_roundtrip(mesh):
    n = 64
    sntt = ShardedNTT(BN254_FR, n, mesh, "data")
    rng = np.random.default_rng(6)
    vals = [int.from_bytes(rng.bytes(31), "little") % BN254_FR.modulus for _ in range(n)]
    x = fr.array(vals)
    back = np.asarray(fr.canon(sntt.intt_coset(sntt.ntt_coset(x))))
    assert np.array_equal(back, np.asarray(fr.canon(x)))


def test_prove_sharded_verifies(mesh):
    from tpusnark.backend.groth16.setup import setup
    from tpusnark.backend.groth16.sharded import prove_sharded
    from tpusnark.backend.groth16.verify import verify
    from tpusnark.frontend.builder import Builder

    p = BN254_FR.modulus
    b = Builder(p)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for _ in range(40):
        acc = b.mul(acc, x)
    b.assert_is_equal(b.add(acc, x, 5), y)
    cs = b.compile()
    assignment = {"x": 3, "y": (pow(3, 41, p) + 3 + 5) % p}
    rng_state = np.random.default_rng(7)
    pk, vk = setup(cs, rng=lambda: int(rng_state.integers(1, 1 << 62)), use_device=False)
    proof = prove_sharded(cs, pk, assignment, mesh)
    assert verify(proof, vk, [assignment["y"]])
    assert not verify(proof, vk, [(assignment["y"] + 1) % p])


@pytest.mark.slow
def test_prove_sharded_awkward_wire_count(mesh):
    """Wire counts that do not align with the mesh (regression for the
    negative-pad crash, ADVICE r1 #2)."""
    from tpusnark.backend.groth16.setup import setup
    from tpusnark.backend.groth16.sharded import prove_sharded
    from tpusnark.backend.groth16.verify import verify
    from tpusnark.frontend.builder import Builder

    p = BN254_FR.modulus
    b = Builder(p)
    xs = [b.secret(f"x{i}") for i in range(3)]
    y = b.public("y")
    # a few public inputs + odd internal wire count
    z = b.mul(xs[0], xs[1])
    z = b.mul(z, xs[2])
    for _ in range(9):
        z = b.mul(z, xs[0])
    b.assert_is_equal(z, y)
    cs = b.compile()
    vals = {"x0": 2, "x1": 3, "x2": 5}
    yv = 2 * 3 * 5 * pow(2, 9, p) % p
    assignment = dict(vals, y=yv)
    rng_state = np.random.default_rng(9)
    pk, vk = setup(cs, rng=lambda: int(rng_state.integers(1, 1 << 62)), use_device=False)
    proof = prove_sharded(cs, pk, assignment, mesh)
    assert verify(proof, vk, [yv])


def test_prove_sharded_bsb22(mesh):
    """The sharded prover must install the BSB22 hint override and carry the
    commitment + PoK on the proof (VERDICT r2 weak #10)."""
    import random

    from tpusnark.backend import groth16
    from tpusnark.backend.groth16.sharded import prove_sharded
    from tpusnark.frontend.builder import Builder

    p = BN254_FR.modulus
    b = Builder(p)
    x = b.secret("x")
    pub = b.public("pub")
    c = b.commit(x, pub)
    x3 = b.mul(x, x, x)
    # pad the domain past the 8-device mesh width
    acc = x
    for _ in range(12):
        acc = b.mul(acc, x)
    b.assert_is_equal(acc, b.mul(x3, x3, x3, x3, x))
    y = b.add(x3, b.mul(c, x), 5, pub)
    yp = b.public("y")
    b.assert_is_equal(y, yp)
    cs = b.compile()

    st = random.Random(7)
    rng = lambda: st.randrange(1, p)
    pk, vk = groth16.setup(cs, rng=rng, use_device=False)

    # learn honest y through the real challenge
    from tpusnark.curves.marshal import g1_raw
    from tpusnark.curves.pedersen import pedersen_commit
    from tpusnark.utils.hash_to_field import COMMITMENT_DST, hash_to_field

    xv, pubv = 3, 11
    C = pedersen_commit(pk.commitment_keys[0], [xv % p])
    (ch,) = hash_to_field(g1_raw(C) + pubv.to_bytes(32, "big"), COMMITMENT_DST, p)
    yv = (pow(xv, 3, p) + ch * xv + 5 + pubv) % p

    proof = prove_sharded(cs, pk, {"x": xv, "pub": pubv, "y": yv}, mesh, rng=rng)
    assert len(proof.commitments) == 1 and proof.commitment_pok is not None
    assert groth16.verify(proof, vk, [pubv, yv])
