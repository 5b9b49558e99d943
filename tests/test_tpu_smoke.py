"""Real-chip smoke tier: the minimum set of on-TPU executions that must pass
before any snapshot (round-2 shipped a TPU-only tracer leak precisely because
no test ever touched the chip).

Run:  TPUSNARK_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -n0 -q

Covers:
  * the round-2 regression repro: a fused op whose FIRST trace at a tile
    shape happens inside a lax.scan body (fields/fuse.py trace cache)
  * a >= 2^15-point G1 MSM (the auto-fuse threshold) with an O(1)-host oracle
  * an NTT round-trip at 2^15
  * the driver's own entry() program

Reference shape: the icicle prover always has a device-correct path
(/root/reference/backend/groth16/bn254/icicle/icicle.go:133).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

LOG2N = 15
N = 1 << LOG2N


@pytest.fixture(scope="module")
def fr():
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FR

    return get_field(BN254_FR)


def test_backend_is_tpu():
    import jax

    assert jax.default_backend() == "tpu", jax.devices()


def test_fused_op_first_traced_inside_scan(fr):
    """Round-2 regression: fp.inv's scan populates fuse's trace cache from
    inside the scan-body trace; the following fp.mul at the same tile shape
    must not reuse tracer constants (UnexpectedTracerError at head of r2)."""
    import jax

    p = fr.spec.modulus
    xs = list(range(1, 1 + N))
    zs = list(range(2, 2 + N))
    x = fr.array(xs)
    z = fr.array(zs)
    out = jax.jit(lambda x, z: fr.mul(x, fr.inv(z)))(x, z)
    got = fr.to_ints(out[:, :16])
    want = [xs[i] * pow(zs[i], p - 2, p) % p for i in range(16)]
    assert got == want


def test_msm_g1_large(fr):
    """2^15-point MSM with points i*G generated on device; oracle is
    sum(s_i * i) * G computed on host in O(1) group ops."""
    import jax.numpy as jnp

    from tpusnark.curves.batch_mul import FixedBaseMul, g1_generator_ladder
    from tpusnark.curves.jcurve import g1_ops
    from tpusnark.curves.ref import G1, R
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FP
    from tpusnark.msm.pippenger import get_msm_for

    fp = get_field(BN254_FP)
    ops = g1_ops(fp)

    # points P_i = t_i * G with t_i = i + 1 (0 is the identity scalar)
    tvals = np.zeros((fr.n, N), dtype=np.uint32)
    idx = np.arange(1, N + 1, dtype=np.uint64)
    tvals[0] = idx & 0xFFFF
    tvals[1] = idx >> 16
    fb = FixedBaseMul(ops, fr, n_bits=32)
    ladder = g1_generator_ladder(fp, 32)
    proj = fb(ladder, jnp.asarray(tvals[:2]))
    Xp, Yp, Zp = proj
    zi = fp.inv(Zp)
    aff = (fp.mul(Xp, zi), fp.mul(Yp, zi), fp.is_zero(Zp))

    rng = np.random.default_rng(3)
    sc = rng.integers(0, 1 << 16, size=(fr.n, N), dtype=np.uint32)
    sc[-1] &= 0x03FF  # < 2^250 < r
    msm = get_msm_for("g1", N)
    out = msm(aff, jnp.asarray(sc))

    # decode projective result -> affine host ints
    X, Y, Z = (fp.to_ints(c) for c in out)
    if Z[0] == 0:
        got = None
    else:
        zi = pow(Z[0], -1, fp.spec.modulus)
        got = (X[0] * zi % fp.spec.modulus, Y[0] * zi % fp.spec.modulus)

    # host oracle: sum_i s_i * (i+1) mod r, one scalar mul
    svals = np.zeros(N, dtype=object)
    acc = 0
    for limb in range(fr.n - 1, -1, -1):
        acc = (acc << 16) * 1  # keep object ints
        svals = (svals << 16) + sc[limb].astype(object)
    total = int(np.sum(svals * idx.astype(object))) % R
    want = G1.mul(G1.generator(), total)
    assert got == want


def test_ntt_roundtrip_large(fr):
    from tpusnark.fields.spec import BN254_FR
    from tpusnark.poly.ntt import get_ntt

    eng = get_ntt(BN254_FR, N)
    rng = np.random.default_rng(5)
    vals = [int(x) for x in rng.integers(0, 1 << 62, size=N)]
    a = fr.array(vals)
    back = eng.intt(eng.ntt(a))
    assert fr.to_ints(back[:, :32]) == vals[:32]


def test_graft_entry_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_msm_g2_large(fr):
    """2^15-point G2 MSM through the FUSED Fp2 kernels — exactly the shape
    class that OOMed scoped VMEM in round 3 (fields/fuse.py tile sizing);
    points repeat 8 host-derived bases so the oracle costs 8 G2 muls."""
    import jax.numpy as jnp

    from tpusnark.curves import ref
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FP, BN254_FR
    from tpusnark.msm.pippenger import get_msm_for

    fp = get_field(BN254_FP)
    rng = np.random.default_rng(7)
    gen = (ref.Fp2(*ref.G2_GEN[0]), ref.Fp2(*ref.G2_GEN[1]))
    bases = [ref.G2.mul(gen, int(rng.integers(1, 1 << 30))) for _ in range(8)]
    pts = [bases[i % 8] for i in range(N)]
    X0 = fp.array([q[0].c0 for q in pts])
    X1 = fp.array([q[0].c1 for q in pts])
    Y0 = fp.array([q[1].c0 for q in pts])
    Y1 = fp.array([q[1].c1 for q in pts])
    inf = jnp.zeros((N,), bool)
    svals = [int(rng.integers(0, 1 << 61)) for _ in range(N)]
    scalars = jnp.asarray(fr.spec.encode(svals, mont=False).T.copy())
    msm = get_msm_for("g2", N)
    Xr, Yr, Zr = msm(((X0, X1), (Y0, Y1), inf), scalars)

    def dec2(t):
        return ref.Fp2(
            fp.to_ints(fp.canon(t[0]), mont=True)[0],
            fp.to_ints(fp.canon(t[1]), mont=True)[0],
        )

    X, Y, Z = dec2(Xr), dec2(Yr), dec2(Zr)
    acc = None
    for bi in range(8):
        s = sum(svals[i] for i in range(N) if i % 8 == bi) % ref.R
        acc = ref.G2.add(acc, ref.G2.mul(bases[bi], s))
    zi = Z.inv()
    assert (X * zi, Y * zi) == acc


def test_groth16_e2e_prove_2_13():
    """End-to-end Groth16 prove+verify at 2^13 constraints on the chip —
    above the auto-fuse threshold, G2 MSM included (the two paths the
    round-3 smoke tier missed and that were broken on hardware)."""
    from tpusnark.backend import groth16
    from tpusnark.fields.spec import BN254_FR
    from tpusnark.frontend.builder import Builder

    p = BN254_FR.modulus
    n = (1 << 13) - 8
    b = Builder(p)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for _ in range(n - 1):
        acc = b.mul(acc, x)
    b.assert_is_equal(b.add(acc, x, 5), y)
    cs = b.compile()
    want = (pow(3, n, p) + 3 + 5) % p
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(cs, pk, {"x": 3, "y": want})
    assert groth16.verify(proof, vk, [want])


def test_ntt_four_step_2_18(fr):
    """Four-step NTT regime (n >= 2^16) on the chip: forward vs host oracle
    at 32 spot indices + full round-trip."""
    from tpusnark.fields.spec import BN254_FR
    from tpusnark.poly.ntt import get_ntt

    n = 1 << 18
    eng = get_ntt(BN254_FR, n)
    assert hasattr(eng, "_sub1")  # four-step regime
    rng = np.random.default_rng(11)
    vals = [int(x) for x in rng.integers(0, 1 << 62, size=n)]
    a = fr.array(vals)
    out = eng.ntt(a)
    back = eng.intt(out)
    assert fr.to_ints(back[:, :32]) == vals[:32]
    # spot-check forward against the defining sum at a few indices
    p = fr.spec.modulus
    w = eng.domain.generator
    got = fr.to_ints(out[:, :2])
    for k in range(2):
        want = sum(v * pow(w, (i * k) % n, p) for i, v in enumerate(vals)) % p
        assert got[k] == want


def test_plonk_e2e_prove_small():
    """PLONK prove+verify on the chip (round 3 never executed PLONK on
    TPU at all)."""
    from tpusnark.backend import plonk
    from tpusnark.fields.spec import BN254_FR
    from tpusnark.frontend.plonk_builder import PlonkBuilder

    p = BN254_FR.modulus
    b = PlonkBuilder(p)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for i in range(100):
        acc = b.mul(acc, x) if i % 2 == 0 else b.add(acc, x)
    b.assert_is_equal(acc, y)
    cs = b.compile()
    xv, av = 3, 3
    for i in range(100):
        av = av * xv % p if i % 2 == 0 else (av + xv) % p
    pk, vk = plonk.setup(cs, tau=777)
    proof = plonk.prove(cs, pk, {"x": xv, "y": av})
    assert plonk.verify(proof, vk, [av])
