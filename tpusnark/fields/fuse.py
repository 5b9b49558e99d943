"""Pallas fusion wrapper: run batched limb math as VMEM-resident TPU kernels.

Why this exists: the limb arithmetic in `jfield.py` is pure jnp and correct,
but XLA materializes its intermediates (the (n*n, N) outer-product columns,
their f32 lo/hi copies, the Kogge-Stone candidates) to HBM at large batch
sizes — one Montgomery mul at batch 2^20 moves ~6 GB and lands at ~34M
muls/s on a v5e chip, two orders of magnitude under the VPU/MXU roofline.

`fuse(fn)` turns ANY elementwise-batched pytree function built from that
limb code into a Pallas kernel: the batch (trailing) axis is tiled, each
tile's whole computation — u32 outer products, skew-reshape antidiagonal
sums, carry propagation — stays in VMEM. Same code, ~5x faster per op and
composable (a fused complete point add is one kernel, not ~40 HBM round
trips).

This is the TPU-native analog of gnark-crypto's hand-written x86-64
Montgomery assembly (reference: generated *_amd64.s in the gnark-crypto
dependency, call sites /root/reference/constraint/bn254/solver.go:35) and of
ICICLE's fused CUDA field kernels: the *scheduling* is what the platform
needs hand-tuning for; the math itself is shared with the oracle jnp path.

Contract for `fn`: every array leaf of its inputs/outputs shares the same
trailing batch-axis length N, and fn is elementwise along that axis (true
for all Field/CurveOps methods). Leaves may have any leading dims (limb
axis, stack axes); those are kept whole per tile, and the tile width is
auto-shrunk so (leading dims x tile) stays within the VMEM budget.

On non-TPU backends `fuse` is the identity: the plain XLA path runs (CPU
tests exercise identical semantics; XLA:CPU fuses fine on its own).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

tree = jax.tree_util

# target (leading-dims x tile) lanes per kernel instance: a 16-limb
# Montgomery mul peaks ~2048 lanes, but complete point adds (wider stacked
# intermediates: the (16,16,6k,T) outer products) overflow the 16 MB VMEM
# beyond ~1-2k lanes — 1024 is the sweet spot measured on v5e
LANE_BUDGET = 1024


def _pad_to(x, n):
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
    return jnp.pad(x, pad)


def fuse(fn, lanes: int = LANE_BUDGET):
    """Wrap `fn(*args) -> pytree` as a batch-tiled Pallas TPU kernel.

    lanes: total per-instance lane budget; the trailing-axis tile is
    lanes // prod(leading batch dims), floored to a multiple of 128.
    """
    from jax.experimental import pallas as pl

    try:  # pallas TPU memory spaces only exist on TPU-enabled builds
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover
        vmem = None

    # (shapes, dtypes) -> (jaxpr, consts2d, const_shapes): re-tracing fn for
    # every call site is wasteful when a graph calls the same op dozens of
    # times at one shape (the 22 unrolled NTT stages); identical jaxprs also
    # keep the Mosaic kernel hash identical so the backend compiles it once.
    trace_cache: dict = {}

    @functools.wraps(fn)
    def wrapped(*args):
        if jax.default_backend() != "tpu":
            return fn(*args)
        from .jfield import IN_PALLAS

        leaves = [x for x in tree.tree_leaves(args) if hasattr(x, "shape")]
        N = leaves[0].shape[-1]
        for x in leaves:
            assert x.shape[-1] == N, "fuse: trailing batch dims must agree"
        lead = max(math.prod(x.shape[1:-1]) for x in leaves)
        tile = max(128, (lanes // max(1, lead)) // 128 * 128)
        tile = min(tile, -(-N // 128) * 128)
        grid_n = -(-N // tile)
        Np = grid_n * tile
        args_p = tree.tree_map(lambda x: _pad_to(x, Np), args)
        out_sd = jax.eval_shape(fn, *args_p)
        flat_in, in_tree = tree.tree_flatten(args_p)

        # Pallas forbids captured constants (modulus limbs, ...): trace fn
        # at TILE shape with the in-kernel math variant selected, pull the
        # jaxpr's constants out, and feed them back as explicit kernel refs.
        def flat_fn(*ls):
            return fn(*tree.tree_unflatten(in_tree, ls))

        tile_sds = [
            jax.ShapeDtypeStruct(x.shape[:-1] + (tile,), x.dtype) for x in flat_in
        ]
        ckey = tuple((s.shape, str(s.dtype)) for s in tile_sds)
        cached = trace_cache.get(ckey)
        if cached is None:
            token = IN_PALLAS.set(True)
            try:
                cj = jax.make_jaxpr(flat_fn)(*tile_sds)
            finally:
                IN_PALLAS.reset(token)
            # Consts MUST be host numpy, never jnp: the first call at a tile
            # shape may happen inside a live scan/fori_loop body trace, where
            # jnp.asarray() returns a tracer of that trace — caching it and
            # reusing it from a different trace is a tracer escape (this broke
            # every on-chip path in round 2). np.asarray of a genuine tracer
            # fails loudly instead; numpy arrays are trace-invariant and get
            # lifted fresh into whatever trace each pallas_call runs under.
            for c in cj.consts:
                if isinstance(c, jax.core.Tracer):
                    raise TypeError(
                        "fuse: kernel jaxpr closed over a tracer constant — "
                        "the fused fn must only capture host/device constants, "
                        f"got {c!r}"
                    )
            consts = [np.asarray(c) for c in cj.consts]
            # TPU refs want >= 2D. 1-D consts get a TRAILING unit dim so the
            # data sits on sublanes: (n,1)->(n,)->(n,1,..) broadcasts are
            # layout-trivial for Mosaic, (1,n)->(n,..) would be a lane->sublane
            # transpose it refuses to lower.
            consts2d = [
                c.reshape(c.shape + (1,) * max(0, 2 - c.ndim)) for c in consts
            ]
            const_shapes = [c.shape for c in consts]
            trace_cache[ckey] = (cj, consts2d, const_shapes)
        else:
            cj, consts2d, const_shapes = cached

        kw = {"memory_space": vmem} if vmem is not None else {}

        def block(shape):
            bs = tuple(shape[:-1]) + (tile,)
            idx = lambda i, nd=len(shape): (0,) * (nd - 1) + (i,)
            return pl.BlockSpec(bs, idx, **kw)

        def const_block(shape):
            return pl.BlockSpec(shape, lambda i, nd=len(shape): (0,) * nd, **kw)

        in_specs = [block(x.shape) for x in flat_in] + [
            const_block(c.shape) for c in consts2d
        ]
        out_specs = tree.tree_map(lambda s: block(s.shape), out_sd)
        n_in = len(flat_in)

        def kernel(*refs):
            ins = [r[...] for r in refs[:n_in]]
            cs = [
                refs[n_in + i][...].reshape(const_shapes[i])
                for i in range(len(consts2d))
            ]
            outs = jax.core.eval_jaxpr(cj.jaxpr, cs, *ins)
            # output refs keep fn's pytree structure (e.g. Fp2 coord tuples)
            out_refs = tree.tree_leaves(refs[n_in + len(consts2d) :])
            for r, o in zip(out_refs, outs):
                r[...] = o

        out = pl.pallas_call(
            kernel,
            grid=(grid_n,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=tree.tree_map(
                lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), out_sd
            ),
        )(*flat_in, *consts2d)
        if Np != N:
            out = tree.tree_map(lambda x: x[..., :N], out)
        return out

    return wrapped
