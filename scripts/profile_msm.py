"""Per-phase MSM profiling on the real chip: argsort, gather variants,
strip scan, compaction, weighting. Grounds optimization decisions."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FP

    fp = get_field(BN254_FP)
    N = 1 << 20
    rng = np.random.default_rng(0)

    # --- argsort of u32 keys -------------------------------------------------
    keys = jnp.asarray(rng.integers(0, 1 << 13, size=N, dtype=np.uint32))
    t, order = timeit(jax.jit(jnp.argsort), keys)
    print(f"argsort u32 2^20:          {t*1e3:8.2f} ms")

    # --- gather variants -----------------------------------------------------
    # packed image: (N, 16) u32 rows (the current design, 64B/row)
    packed = jnp.asarray(rng.integers(0, 1 << 32, size=(N, 16), dtype=np.uint64).astype(np.uint32))
    order = jnp.asarray(rng.permutation(N).astype(np.int32))

    t, _ = timeit(jax.jit(lambda p, o: p[o]), packed, order)
    print(f"gather (N,16)u32 rows:     {t*1e3:8.2f} ms  ({N*64/t/1e9:.1f} GB/s)")

    packedT = packed.T  # (16, N)
    t, _ = timeit(jax.jit(lambda p, o: p[:, o]), packedT, order)
    print(f"gather (16,N)u32 cols:     {t*1e3:8.2f} ms  ({N*64/t/1e9:.1f} GB/s)")

    # co-sort payload with keys (variadic sort)
    keys32 = keys.astype(jnp.uint32)

    def cosort(k, p):
        outs = jax.lax.sort((k,) + tuple(p.T[i] for i in range(16)), num_keys=1)
        return outs[1]

    t, _ = timeit(jax.jit(cosort), keys32, packed)
    print(f"variadic co-sort 16 ops:   {t*1e3:8.2f} ms")

    # gather half the bytes (32B rows)
    packed8 = packed[:, :8]
    t, _ = timeit(jax.jit(lambda p, o: p[o]), packed8, order)
    print(f"gather (N,8)u32 rows:      {t*1e3:8.2f} ms  ({N*32/t/1e9:.1f} GB/s)")

    # two gathers of 8 cols each (does splitting help?)
    def gather2(p, o):
        return p[o, :8], p[o, 8:]

    t, _ = timeit(jax.jit(gather2), packed, order)
    print(f"2x gather (N,8)u32:        {t*1e3:8.2f} ms")

    # --- strip-scan cost (complete mixed add chain) --------------------------
    from tpusnark.curves.jcurve import g1_ops_fused

    ops = g1_ops_fused(fp)
    C = 1 << 13
    X = jnp.asarray(rng.integers(0, 1 << 16, size=(16, C), dtype=np.uint32))
    Y = jnp.asarray(rng.integers(0, 1 << 16, size=(16, C), dtype=np.uint32))
    proj = (X, Y, jnp.ones_like(X))

    R = N // C

    def strip(proj, X, Y):
        def step(acc, _):
            return ops.add_mixed(acc, (X, Y)), None

        acc, _ = jax.lax.scan(step, proj, None, length=R)
        return acc

    t, _ = timeit(jax.jit(strip), proj, X, Y, reps=2)
    print(f"strip scan {R}x{C} madd:   {t*1e3:8.2f} ms  ({N/t/1e6:.1f} M adds/s)")

    # narrower strips, more rows
    C2 = 1 << 11
    X2, Y2 = X[:, :C2], Y[:, :C2]
    proj2 = (X2, Y2, jnp.ones_like(X2))
    R2 = N // C2

    def strip2(proj, X, Y):
        def step(acc, _):
            return ops.add_mixed(acc, (X, Y)), None

        acc, _ = jax.lax.scan(step, proj, None, length=R2)
        return acc

    t, _ = timeit(jax.jit(strip2), proj2, X2, Y2, reps=2)
    print(f"strip scan {R2}x{C2} madd: {t*1e3:8.2f} ms  ({N/t/1e6:.1f} M adds/s)")

    # --- in-kernel mul rate at strip width -----------------------------------
    from tpusnark.fields.fuse import fuse

    mulk = fuse(fp._mul_impl)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, 1 << 20), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, 1 << 20), dtype=np.uint32))

    @jax.jit
    def chained(a, b):
        def body(_, o):
            return mulk(o, b)

        return jax.lax.fori_loop(0, 24, body, a)

    t, _ = timeit(chained, a, b, reps=2)
    print(f"fused mul chain 2^20x24:   {t*1e3:8.2f} ms  ({24*(1<<20)/t/1e6:.1f} M muls/s)")


if __name__ == "__main__":
    main()
