"""Pippenger multi-scalar multiplication on TPU.

The TPU-native replacement for gnark-crypto's MultiExp (Pippenger with
NbTasks core-splitting; reference call sites
/root/reference/backend/groth16/bn254/prove.go:201-290) and for the fork's
GPU MsmOnDevice (/root/reference/backend/groth16/bn254/icicle/icicle.go:302-382).

Design (per SURVEY.md §7 step 3): scatter-contention-free bucket
accumulation via sort-by-digit + segmented reduction:

  1. window digits extracted on device from scalar limbs (c-bit windows)
  2. per window (lax.map so the graph compiles once, windows run serially —
     bounding peak memory): stable sort by digit, gather points into sorted
     order, then a Hillis-Steele inclusive *segmented* scan (log2 N rounds of
     batched complete adds) whose segment-end elements are the bucket sums
  3. bucket weighting sum_b b*S_b = sum of suffix sums: one suffix scan over
     the bucket axis + one prefix scan (each log2 B rounds, roll-based)
  4. window combine: Horner over windows (c doublings per window, lax.scan)

Complete (branch-free) point formulas make every add valid regardless of
lane contents; garbage lanes are masked by selects. All phases jit into one
program; points stay device-resident. Cost is O(N log N) complete adds — the
O(N) chunked-scan accumulation kernel is the planned upgrade.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.jcurve import CurveOps
from ..fields.jfield import Field

tree_map = jax.tree_util.tree_map


@functools.lru_cache(maxsize=None)
def get_msm(curve: str = "g1", c: int = 13) -> "MSM":
    """Shared MSM engine per (curve, window size): reuses jit caches across
    callers (a fresh engine would recompile every graph)."""
    from ..curves.jcurve import g1_ops, g2_ops
    from ..fields.jfield import get_field
    from ..fields.spec import BN254_FP, BN254_FR

    fp = get_field(BN254_FP)
    fr = get_field(BN254_FR)
    ops = g1_ops(fp) if curve == "g1" else g2_ops(fp)
    return MSM(ops, fr, c=c)


def auto_c(n_points: int) -> int:
    """Pippenger window size for n points: ~log2(n), clamped. The bucket
    scans cost O(2^c) lanes x c rounds per window, so oversizing c for small
    n wastes orders of magnitude of work (gnark-crypto picks c from n the
    same way in MultiExpConfig)."""
    return max(2, min(13, max(1, n_points).bit_length() - 1))


def get_msm_for(curve: str, n_points: int) -> "MSM":
    """MSM engine with window size adapted to the problem size."""
    return get_msm(curve, auto_c(n_points))


def window_digits(scalars, n_limbs: int, c: int, n_windows: int):
    """(n_limbs, N) normal-form 16-bit limbs -> (n_windows, N) c-bit digits."""
    assert c <= 16
    out = []
    for w in range(n_windows):
        bit0 = w * c
        k, r = bit0 // 16, bit0 % 16
        d = scalars[k] >> jnp.uint32(r)
        if r + c > 16 and k + 1 < n_limbs:
            d = d | (scalars[k + 1] << jnp.uint32(16 - r))
        out.append(d & jnp.uint32((1 << c) - 1))
    return jnp.stack(out, axis=0)


class MSM:
    """MSM engine bound to (CurveOps, scalar Field). Works for G1 and G2."""

    def __init__(self, ops: CurveOps, fr: Field, c: int = 13):
        self.ops = ops
        self.fr = fr
        self.c = c
        self.scalar_bits = fr.spec.modulus.bit_length()
        self.n_windows = -(-self.scalar_bits // c)
        self._msm_j = jax.jit(self._msm_impl)

    def __call__(self, points_affine, scalars_norm):
        """points: (X, Y, inf) with coords (L, N) (X/Y possibly (c0,c1) tuples
        for G2); scalars: (L, N) NORMAL-form 16-bit limbs. Returns a
        projective point with batch dim 1."""
        return self._msm_j(points_affine, scalars_norm)

    # ------------------------------------------------------------------ impl
    def _msm_impl(self, points_affine, scalars):
        ops, c = self.ops, self.c
        B = 1 << c
        X, Y, inf = points_affine
        N = inf.shape[-1]
        digits = window_digits(scalars, self.fr.n, c, self.n_windows)
        # infinity inputs always land in the (ignored) 0 bucket
        digits = jnp.where(inf[None, :], jnp.uint32(0), digits)
        pts0 = ops.from_affine((X, Y, inf))

        iota_n = jnp.arange(N, dtype=jnp.int32)
        iota_b = jnp.arange(B, dtype=jnp.int32)
        n_rounds = max((N - 1).bit_length(), 0)
        b_rounds = (B - 1).bit_length()

        def per_window(key):
            order = jnp.argsort(key)
            skey = key[order]
            pts = tree_map(lambda a: a[..., order], pts0)

            # segmented inclusive scan (reduce-by-key)
            def seg_round(r, pts):
                d = jnp.int32(1) << r
                shifted = tree_map(lambda a: jnp.roll(a, d, axis=-1), pts)
                kshift = jnp.roll(skey, d)
                same = (iota_n >= d) & (kshift == skey)
                return ops.select(same, ops.add(pts, shifted), pts)

            pts = jax.lax.fori_loop(0, n_rounds, seg_round, pts)

            # scatter segment-end sums into buckets (dummy slot B for non-ends).
            # base array = identity points (0:1:0): empty buckets must be the
            # group identity, not all-zeros garbage, for the complete formulas.
            is_end = jnp.concatenate([skey[:-1] != skey[1:], jnp.array([True])])
            sidx = jnp.where(is_end, skey, jnp.uint32(B)).astype(jnp.int32)
            x_templ = tree_map(lambda a: jnp.zeros(a.shape[:-1] + (B + 1,), a.dtype), pts[0])
            ident_base = ops.identity_like(x_templ)
            buckets = tree_map(
                lambda ini, a: ini.at[..., sidx].set(a)[..., :B], ident_base, pts
            )

            # suffix scan: buckets[b] <- sum_{j>=b} buckets[j]
            def suf_round(r, bk):
                d = jnp.int32(1) << r
                shifted = tree_map(lambda a: jnp.roll(a, -d, axis=-1), bk)
                valid = iota_b < B - d
                return ops.select(valid, ops.add(bk, shifted), bk)

            buckets = jax.lax.fori_loop(0, b_rounds, suf_round, buckets)

            # weighted sum = sum_{b>=1} suffix[b]: mask b=0, prefix scan, take last
            mask = iota_b >= 1
            ident = ops.identity_like(tree_map(lambda a: a, buckets[0]))
            vals = ops.select(mask, buckets, ident)

            def pre_round(r, bk):
                d = jnp.int32(1) << r
                shifted = tree_map(lambda a: jnp.roll(a, d, axis=-1), bk)
                valid = iota_b >= d
                return ops.select(valid, ops.add(bk, shifted), bk)

            vals = jax.lax.fori_loop(0, b_rounds, pre_round, vals)
            return tree_map(lambda a: a[..., B - 1 : B], vals)  # batch-1 point

        wsums = jax.lax.map(per_window, digits)  # leading axis = window

        # Horner from the top window down: acc = 2^c * acc + wsum[w]
        acc0 = tree_map(lambda a: a[self.n_windows - 1], wsums)
        rest = tree_map(lambda a: a[: self.n_windows - 1][::-1], wsums)

        def comb(acc, ws):
            acc = jax.lax.fori_loop(0, c, lambda i, a: ops.double(a), acc)
            return ops.add(acc, ws), None

        acc, _ = jax.lax.scan(comb, acc0, rest)
        return acc


def msm_naive_ref(points, scalars):
    """Python-int oracle: sum s_i * P_i via the reference G1 class."""
    from ..curves.ref import G1

    acc = None
    for pt, s in zip(points, scalars):
        acc = G1.add(acc, G1.mul(pt, s))
    return acc
