"""Phase breakdown of the real MSM via _debug_stop early exits."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpusnark.curves.batch_mul import FixedBaseMul, g1_generator_ladder
    from tpusnark.curves.jcurve import g1_ops
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FP, BN254_FR
    from tpusnark.msm.pippenger import MSM, get_msm_for

    n = 1 << 20
    fp = get_field(BN254_FP)
    fr = get_field(BN254_FR)
    rng = np.random.default_rng(0)

    def rand_scalars(n, seed):
        r = np.random.default_rng(seed)
        arr = r.integers(0, 1 << 16, size=(fr.n, n), dtype=np.uint32)
        arr[-1] &= 0x03FF
        return jnp.asarray(arr)

    fb = FixedBaseMul(g1_ops(fp), fr, n_bits=64)
    ladder = g1_generator_ladder(fp, 64)
    tvals = rand_scalars(n, 1)[:4]
    proj = fb(ladder, tvals)

    @jax.jit
    def normalize(pt):
        X, Y, Z = pt
        zi = fp.inv(Z)
        return fp.mul(X, zi), fp.mul(Y, zi), fp.is_zero(Z)

    points = jax.block_until_ready(normalize(proj))
    scalars = rand_scalars(n, 2)

    base = get_msm_for("g1", n)
    print(f"c={base.c} windows={base.n_windows}", flush=True)

    prev = 0.0
    for stop in ["gather", "strip", None]:
        msm = MSM(base.ops, fr, c=base.c)
        msm._debug_stop = stop
        out = jax.block_until_ready(msm(points, scalars))
        t0 = time.perf_counter()
        for _ in range(3):
            out = jax.block_until_ready(msm(points, scalars))
        dt = (time.perf_counter() - t0) / 3
        print(f"stop={str(stop):8s}: {dt*1e3:8.1f} ms  (delta {1e3*(dt-prev):7.1f})", flush=True)
        prev = dt

    # strips variant: C=16384 (R=64)
    msm = MSM(base.ops, fr, c=base.c, strips=1 << 14)
    out = jax.block_until_ready(msm(points, scalars))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(msm(points, scalars))
    dt = (time.perf_counter() - t0) / 3
    print(f"strips=2^14:   {dt*1e3:8.1f} ms", flush=True)

    # c=15
    msm = MSM(base.ops, fr, c=15)
    out = jax.block_until_ready(msm(points, scalars))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(msm(points, scalars))
    dt = (time.perf_counter() - t0) / 3
    print(f"c=15:          {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
