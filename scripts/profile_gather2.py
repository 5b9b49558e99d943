"""Why is the packed gather 0.11 ms standalone but ~12 ms in-graph?
Candidates: argsort-as-producer, fusion with consumers, lax.map context."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    N = 1 << 20
    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.integers(0, 1 << 32, size=(16, N), dtype=np.uint64).astype(np.uint32)
    )
    order_np = rng.permutation(N).astype(np.int32)
    order = jnp.asarray(order_np)
    keys = jnp.asarray(rng.integers(0, 1 << 15, size=N, dtype=np.uint32))

    # 1: plain gather, order as argument
    t = timeit(jax.jit(lambda p, o: p[:, o]), packed, order)
    print(f"1 gather(arg order):            {t*1e3:8.2f} ms")

    # 2: gather, order from in-graph argsort
    t = timeit(jax.jit(lambda p, k: p[:, jnp.argsort(k)]), packed, keys)
    print(f"2 gather(argsort order):        {t*1e3:8.2f} ms")

    # 3: argsort only
    t = timeit(jax.jit(lambda k: jnp.argsort(k)), keys)
    print(f"3 argsort only:                 {t*1e3:8.2f} ms")

    # 4: gather with sum consumer (DCE check), arg order
    t = timeit(jax.jit(lambda p, o: p[:, o].sum()), packed, order)
    print(f"4 gather(arg)+sum:              {t*1e3:8.2f} ms")

    # 5: gather via jnp.take axis=1
    t = timeit(jax.jit(lambda p, o: jnp.take(p, o, axis=1).sum()), packed, order)
    print(f"5 take(arg)+sum:                {t*1e3:8.2f} ms")

    # 6: 1-D gather k[o]
    t = timeit(jax.jit(lambda k, o: k[o].sum()), keys, order)
    print(f"6 1-D gather(arg)+sum:          {t*1e3:8.2f} ms")

    # 7: 1-D gather as 2-D: k[None,:][:, o]
    t = timeit(jax.jit(lambda k, o: k[None, :][:, o].sum()), keys, order)
    print(f"7 1-D as (1,N) gather:          {t*1e3:8.2f} ms")

    # 8: sorted (monotone-ish) indices: does locality matter?
    sorted_idx = jnp.asarray(np.sort(order_np))
    t = timeit(jax.jit(lambda p, o: p[:, o].sum()), packed, sorted_idx)
    print(f"8 gather(sorted idx)+sum:       {t*1e3:8.2f} ms")

    # 9: variadic sort: key + 16 payload rows, ALL outputs consumed
    def cosort_all(k, p):
        outs = jax.lax.sort((k,) + tuple(p[i] for i in range(16)), num_keys=1)
        return sum(o.sum() for o in outs)

    t = timeit(jax.jit(cosort_all), keys, packed)
    print(f"9 co-sort 17 ops (no DCE):      {t*1e3:8.2f} ms")

    # 10: co-sort key+iota (argsort equivalent)
    def cosort2(k):
        outs = jax.lax.sort((k, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        return outs[0].sum() + outs[1].sum()

    t = timeit(jax.jit(cosort2), keys)
    print(f"10 co-sort key+iota:            {t*1e3:8.2f} ms")

    # 11: gather inside lax.map (orders precomputed as xs)
    orders16 = jnp.stack([order] * 16)

    def body(o):
        return packed[:, o].sum()

    t = timeit(jax.jit(lambda os_: jax.lax.map(body, os_)), orders16)
    print(f"11 map gather(xs order):        {t*1e3:8.2f} ms ({t/16*1e3:.2f}/win)")


if __name__ == "__main__":
    main()
