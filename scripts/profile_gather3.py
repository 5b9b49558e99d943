"""Honest (in-lax.map, distinct data per step) gather layout comparison."""

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
    N = 1 << 20
    W = 16
    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.integers(0, 1 << 32, size=(16, N), dtype=np.uint64).astype(np.uint32)
    )
    packedT = jnp.asarray(np.asarray(packed).T.copy())  # (N, 16)
    full32 = jnp.asarray(
        rng.integers(0, 1 << 32, size=(32, N), dtype=np.uint64).astype(np.uint32)
    )
    orders = jnp.asarray(
        np.stack([rng.permutation(N) for _ in range(W)]).astype(np.int32)
    )
    keys = jnp.asarray(rng.integers(0, 1 << 15, size=(W, N), dtype=np.uint32))

    def run(tag, body, *args):
        t = timeit(jax.jit(lambda *a: jax.lax.map(body, a)), *args)
        print(f"{tag:34s} {t*1e3:8.1f} ms ({t/W*1e3:6.2f}/win)", flush=True)

    run("a minor gather (16,N)[:,o]", lambda o: packed[:, o].sum(), orders)
    run("b row gather (N,16)[o]", lambda o: packedT[o].sum(), orders)
    run("i minor gather (32,N)[:,o]", lambda o: full32[:, o].sum(), orders)

    def cosort17(xs):
        k, _ = xs
        ops_ = (k,) + tuple(packed[i] for i in range(16))
        outs = jax.lax.sort(ops_, num_keys=1)
        return sum(o.sum() for o in outs)

    run("d co-sort key+16 rows", cosort17, keys, orders)

    def sort2(xs):
        k, o = xs
        outs = jax.lax.sort((k, o), num_keys=1)
        return outs[0].sum() + outs[1].sum()

    run("e sort (key, payload-idx)", sort2, keys, orders)

    # proposed pipeline: sort2 + one minor gather
    def pipe(xs):
        k, o = xs
        sk, so = jax.lax.sort((k, o), num_keys=1)
        return sk.sum() + packed[:, so].sum()

    run("j sort2 + minor gather", pipe, keys, orders)


if __name__ == "__main__":
    main()
