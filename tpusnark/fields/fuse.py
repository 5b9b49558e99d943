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
from jax.extend.core import Literal as _Literal

tree = jax.tree_util

# upper bound on (leading-dims x tile) lanes per kernel instance; the
# actual tile is sized per-op from a liveness estimate of the traced kernel
# against the scoped-VMEM budget (see _peak_live_bytes): a 2-ary 16-limb
# Montgomery mul tops out ~2048 lanes, while the G2 (Fp2) complete mixed add
# carries ~27 operand/carry arrays and only fits at ~256-512 lanes — one
# fixed budget cannot serve both (a 1024-lane G2 add needs 23.5 MB scoped
# VMEM vs the 16 MB Mosaic limit).
LANE_BUDGET = 2048

# scoped-VMEM target for the liveness estimate. The hardware limit is 16 MB;
# the estimate is optimistic (Mosaic's allocator double-buffers grid blocks
# and spills vector registers), so aim well under it.
VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _peak_live_bytes(closed_jaxpr) -> int:
    """Upper-bound estimate of peak live bytes while evaluating a jaxpr.

    Walks equations in order tracking the byte-size of every live value
    (defined, not yet past its last use). This approximates what a
    liveness-driven VMEM allocator achieves for the straight-line
    elementwise kernels `fuse` builds (no control flow sub-jaxprs)."""
    jaxpr = closed_jaxpr.jaxpr

    def size(v):
        aval = v.aval
        if not hasattr(aval, "shape"):
            return 0
        return math.prod(aval.shape) * jnp.dtype(aval.dtype).itemsize

    last_use: dict = {}
    for idx, eqn in enumerate(jaxpr.eqns):
        for v in eqn.invars:
            if not isinstance(v, _Literal):
                last_use[v] = idx
    for v in jaxpr.outvars:
        if not isinstance(v, _Literal):
            last_use[v] = len(jaxpr.eqns)

    live = {v: size(v) for v in (*jaxpr.invars, *jaxpr.constvars)}
    cur = sum(live.values())
    peak = cur
    for idx, eqn in enumerate(jaxpr.eqns):
        for v in eqn.outvars:
            if v not in live:
                live[v] = size(v)
                cur += live[v]
        peak = max(peak, cur)
        for v in eqn.invars:
            if (
                not isinstance(v, _Literal)
                and last_use.get(v) == idx
                and v not in jaxpr.outvars
            ):
                cur -= live.pop(v, 0)
    return peak


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
    # structure key (leaf shapes sans trailing axis) -> chosen tile width
    tile_cache: dict = {}

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
        tile_cap = max(128, (lanes // max(1, lead)) // 128 * 128)

        def trace_at(t):
            """Trace fn at tile width t (cached); returns the trace triple."""
            sds = [
                jax.ShapeDtypeStruct(x.shape[:-1] + (t,), x.dtype)
                for x in tree.tree_leaves(args)
            ]
            key = tuple((s.shape, str(s.dtype)) for s in sds)
            cached = trace_cache.get(key)
            if cached is not None:
                return cached
            token = IN_PALLAS.set(True)
            try:
                cj = jax.make_jaxpr(
                    lambda *ls: fn(*tree.tree_unflatten(in_tree0, ls))
                )(*sds)
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
            trace_cache[key] = (cj, consts2d, const_shapes)
            return trace_cache[key]

        _, in_tree0 = tree.tree_flatten(args)

        # per-op tile sizing: probe-trace at 128 lanes, liveness-estimate the
        # scoped-VMEM bytes, and scale the tile so the estimate stays within
        # budget. Wide ops (G2 point adds: ~27 live coordinate/carry arrays)
        # get narrow tiles; 2-ary field ops keep the full cap.
        skey = tuple((x.shape[:-1], str(x.dtype)) for x in leaves)
        tile = tile_cache.get(skey)
        if tile is None:
            probe, _, _ = trace_at(128)
            per_lane = max(1, _peak_live_bytes(probe) // 128)
            tile = max(128, (VMEM_BUDGET_BYTES // per_lane) // 128 * 128)
            tile_cache[skey] = tile
        tile = min(tile, tile_cap)
        tile = min(tile, -(-N // 128) * 128)
        grid_n = -(-N // tile)
        Np = grid_n * tile
        args_p = tree.tree_map(lambda x: _pad_to(x, Np), args)
        out_sd = jax.eval_shape(fn, *args_p)
        flat_in, _ = tree.tree_flatten(args_p)

        # Pallas forbids captured constants (modulus limbs, ...): trace fn
        # at TILE shape with the in-kernel math variant selected, pull the
        # jaxpr's constants out, and feed them back as explicit kernel refs.
        cj, consts2d, const_shapes = trace_at(tile)

        kw = {"memory_space": vmem} if vmem is not None else {}

        # Rank-1 leaves (bool/int masks, strip keys) cross the pallas_call
        # boundary as (1, N): XLA gives large 1-D arrays coarse linear
        # tilings (e.g. {0:T(1024)} for s32[8192]) that only match Mosaic's
        # expectation when the block width happens to equal the tile — a
        # trap the adaptive tile sizing exposed. 2-D operands always get the
        # standard (8, 128) tiling, which any 128-multiple block satisfies.
        def lift(x):
            return x[None] if x.ndim == 1 else x

        flat_in_l = [lift(x) for x in flat_in]
        lifted_in = [x.ndim == 1 for x in flat_in]
        out_sd_flat, out_tree = tree.tree_flatten(out_sd)
        lifted_out = [s.ndim == 1 for s in out_sd_flat]

        def block(shape):
            bs = tuple(shape[:-1]) + (tile,)
            idx = lambda i, nd=len(shape): (0,) * (nd - 1) + (i,)
            return pl.BlockSpec(bs, idx, **kw)

        def const_block(shape):
            return pl.BlockSpec(shape, lambda i, nd=len(shape): (0,) * nd, **kw)

        in_specs = [block(x.shape) for x in flat_in_l] + [
            const_block(c.shape) for c in consts2d
        ]
        out_specs_flat = [
            block((1,) + s.shape if lif else s.shape)
            for s, lif in zip(out_sd_flat, lifted_out)
        ]
        n_in = len(flat_in_l)

        def kernel(*refs):
            ins = [
                r[...][0] if lif else r[...]
                for r, lif in zip(refs[:n_in], lifted_in)
            ]
            cs = [
                refs[n_in + i][...].reshape(const_shapes[i])
                for i in range(len(consts2d))
            ]
            outs = jax.core.eval_jaxpr(cj.jaxpr, cs, *ins)
            # output refs keep fn's pytree structure (e.g. Fp2 coord tuples)
            out_refs = list(refs[n_in + len(consts2d) :])
            for r, o, lif in zip(out_refs, outs, lifted_out):
                r[...] = o[None] if lif else o

        out_flat = pl.pallas_call(
            kernel,
            grid=(grid_n,),
            in_specs=in_specs,
            out_specs=out_specs_flat,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (1,) + s.shape if lif else s.shape, s.dtype
                )
                for s, lif in zip(out_sd_flat, lifted_out)
            ],
        )(*flat_in_l, *consts2d)
        out_flat = [
            o[0] if lif else o for o, lif in zip(out_flat, lifted_out)
        ]
        out = tree.tree_unflatten(out_tree, out_flat)
        if Np != N:
            out = tree.tree_map(lambda x: x[..., :N], out)
        return out

    return wrapped
