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
