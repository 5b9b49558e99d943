"""Isolate the in-MSM gather-phase slowdown: standalone vs lax.map, with
and without optimization barriers."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FP

    fp = get_field(BN254_FP)
    N = 1 << 20
    W = 16
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32))
    Y = jnp.asarray(rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32))
    inf = jnp.zeros((N,), dtype=bool)
    keys = jnp.asarray(rng.integers(0, 1 << 15, size=(W, N), dtype=np.uint32))
    signs = jnp.asarray(rng.integers(0, 2, size=(W, N)).astype(bool))

    allc = jnp.concatenate([X, Y], axis=0)
    packed = allc[0::2] | (allc[1::2] << jnp.uint32(16))

    def phase(key, sign, barrier):
        order = jnp.argsort(key)
        skey = key[order]
        sgn = sign[order]
        g = packed[:, order]
        if barrier:
            g, = jax.lax.optimization_barrier((g,))
        lo = g & jnp.uint32(0xFFFF)
        hi = g >> jnp.uint32(16)
        full = jnp.stack([lo, hi], axis=1).reshape(32, N)
        Xg, Yg = full[:16], full[16:]
        Yg = jnp.where(sgn, fp.neg(Yg), Yg)
        return skey[:1], Xg[..., :1], Yg[..., :1]

    # A: single window standalone
    f1 = jax.jit(lambda k, s: phase(k, s, False))
    t = timeit(f1, keys[0], signs[0])
    print(f"A standalone 1 window:          {t*1e3:8.2f} ms")

    # A': sum over all outputs to defeat DCE
    def phase_full(key, sign, barrier):
        order = jnp.argsort(key)
        skey = key[order]
        sgn = sign[order]
        g = packed[:, order]
        if barrier:
            g, = jax.lax.optimization_barrier((g,))
        lo = g & jnp.uint32(0xFFFF)
        hi = g >> jnp.uint32(16)
        full = jnp.stack([lo, hi], axis=1).reshape(32, N)
        Xg, Yg = full[:16], full[16:]
        Yg = jnp.where(sgn, fp.neg(Yg), Yg)
        return skey.sum() + Xg.sum() + Yg.sum()

    f2 = jax.jit(lambda k, s: phase_full(k, s, False))
    t = timeit(f2, keys[0], signs[0])
    print(f"B standalone no-DCE:            {t*1e3:8.2f} ms")

    f3 = jax.jit(lambda k, s: phase_full(k, s, True))
    t = timeit(f3, keys[0], signs[0])
    print(f"C standalone + barrier:         {t*1e3:8.2f} ms")

    # D: inside lax.map over 16 windows
    f4 = jax.jit(lambda ks, ss: jax.lax.map(lambda xs: phase_full(xs[0], xs[1], False), (ks, ss)))
    t = timeit(f4, keys, signs)
    print(f"D lax.map 16 windows:           {t*1e3:8.2f} ms ({t/W*1e3:.2f}/win)")

    f5 = jax.jit(lambda ks, ss: jax.lax.map(lambda xs: phase_full(xs[0], xs[1], True), (ks, ss)))
    t = timeit(f5, keys, signs)
    print(f"E lax.map + barrier:            {t*1e3:8.2f} ms ({t/W*1e3:.2f}/win)")

    # F: pieces inside map: argsort only
    f6 = jax.jit(lambda ks: jax.lax.map(lambda k: jnp.argsort(k)[:1], ks))
    t = timeit(f6, keys)
    print(f"F map argsort only:             {t*1e3:8.2f} ms ({t/W*1e3:.2f}/win)")

    # G: argsort + key/sign gathers only
    def g7(xs):
        k, s = xs
        o = jnp.argsort(k)
        return k[o].sum(), s[o].sum()

    f7 = jax.jit(lambda ks, ss: jax.lax.map(g7, (ks, ss)))
    t = timeit(f7, keys, signs)
    print(f"G map sort+key/sgn gathers:     {t*1e3:8.2f} ms ({t/W*1e3:.2f}/win)")

    # H: + packed gather (sum to defeat DCE)
    def g8(xs):
        k, s = xs
        o = jnp.argsort(k)
        return k[o].sum(), packed[:, o].sum()

    f8 = jax.jit(lambda ks, ss: jax.lax.map(g8, (ks, ss)))
    t = timeit(f8, keys, signs)
    print(f"H map sort+packed gather:       {t*1e3:8.2f} ms ({t/W*1e3:.2f}/win)")


if __name__ == "__main__":
    main()
