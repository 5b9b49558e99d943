"""Pippenger multi-scalar multiplication on TPU.

The TPU-native replacement for gnark-crypto's MultiExp (Pippenger with
NbTasks core-splitting; reference call sites
/root/reference/backend/groth16/bn254/prove.go:201-290) and for the fork's
GPU MsmOnDevice (/root/reference/backend/groth16/bn254/icicle/icicle.go:302-382).

Design (per SURVEY.md §7 step 3): scatter-contention-free bucket
accumulation via sort-by-digit + segmented reduction:

  1. window digits extracted on device from scalar limbs (c-bit windows)
  2. windows processed in BATCHES (lax.map batch_size): inside a batch every
     per-window phase is vmapped, so the sorts/gathers/scan steps of several
     windows share kernels. The MSM is kernel-launch-latency-bound, not
     FLOP-bound, so batching windows is the single biggest throughput lever.
  3. per window: stable sort by digit, gather AFFINE points into sorted
     order, then either
       * log-scan (small N): Hillis-Steele segmented scan, O(N log N) adds; or
       * strip accumulation (large N): split the sorted array into C
         contiguous strips of R rows; accumulate each strip SEQUENTIALLY with
         one C-wide batched complete MIXED add per row — O(N) adds total —
         emitting a flush record at each key boundary; at most B + C real
         records survive, compacted by an integer argsort and reduced with
         the small log-scan.
  4. bucket weighting sum_b b*S_b via radix split (two small weighted sums)
  5. window combine: Horner over windows (c doublings per window, lax.scan)

Complete (branch-free) point formulas make every add valid regardless of
lane contents; garbage lanes are masked by selects. All phases jit into one
program; points stay device-resident.
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
def get_msm(curve: str = "g1", c: int = 13, curve_name: str = "bn254") -> "MSM":
    """Shared MSM engine per (group, window size, curve): reuses jit caches
    across callers (a fresh engine would recompile every graph)."""
    from ..curves.config import get_curve
    from ..curves.jcurve import g1_ops_fused, g2_ops_fused
    from ..fields.jfield import get_field

    cfg = get_curve(curve_name)
    fp = get_field(cfg.fp_spec)
    fr = get_field(cfg.fr_spec)
    if curve == "g1":
        ops = g1_ops_fused(fp, b=cfg.g1_b)
    elif cfg.g2_over_fp:
        # BW6: G2 is a sextic twist over Fp itself -> G1-style kernels
        ops = g1_ops_fused(fp, b=cfg.g2_b)
    elif cfg.g2_fp4:
        # BLS24: G2 over Fp4 (tower kernels, see jcurve.Fp4Arith)
        from ..curves.jcurve import g2_ops_fp4_fused

        ops = g2_ops_fp4_fused(
            fp, cfg.g2_b3_fp4, a2=cfg.fp4_a2, z2=cfg.fp4_z2
        )
    else:
        ops = g2_ops_fused(fp, b3=cfg.g2_b3, q=cfg.fp2_q)
    return MSM(ops, fr, c=c)


def auto_c(n_points: int) -> int:
    """Pippenger window size for n points: ~log2(n)+1, clamped to 16 (the
    limb width). Signed digits halve the bucket count at a given c, so the
    sweet spot sits one window-bit above the unsigned heuristic; at large n
    c=16 cuts BN254 from 20 windows (c=13) to 16 (gnark-crypto picks c from
    n the same way in MultiExpConfig)."""
    return max(2, min(16, max(1, n_points).bit_length()))


def get_msm_for(curve: str, n_points: int, curve_name: str = "bn254") -> "MSM":
    """MSM engine with window size adapted to the problem size."""
    return get_msm(curve, auto_c(n_points), curve_name)


def auto_c_many(n_points: int, k: int, scalar_bits: int = 254) -> int:
    """Window size for a k-polynomial composite MSM: minimize the modeled
    per-MSM cost W(c) * [strip mixed adds + the flush-record reduction],
    which pushes c DOWN as k grows (the reduction phases scale with
    k * 2^(c-1) while the strip adds don't). Buckets are SIGNED-digit:
    2^(c-1) live buckets per window."""
    M0 = k * max(1, n_points)
    best_c, best_cost = 2, float("inf")
    for c in range(4, 17):
        W = -(-(scalar_bits + 1) // c)
        B = 1 << (c - 1)
        C = min(1 << 13, 1 << max(3, (M0 - 1).bit_length() - 6))
        K = k * B + C
        if M0 >= MSM.STRIP_THRESHOLD and c - 1 > 8:
            # hierarchical reduce: two strip passes + tiny scans over K
            reduce_cost = K * 2 * 14 + 2 * k * 512 * 14
        else:
            # flat log-scan into k*B buckets + radix weighting
            m = max(M0, K)
            reduce_cost = m * max(1, (m - 1).bit_length()) * 14 + 2 * k * B * 14
        cost = W * (M0 * 12.5 + reduce_cost)
        if cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def get_msm_many_for(
    curve: str, n_points: int, k: int, curve_name: str = "bn254"
) -> "MSM":
    """MSM engine sized for k same-size polynomials over shared points."""
    return get_msm(curve, auto_c_many(n_points, k), curve_name)


def window_digits(scalars, n_limbs: int, c: int, n_windows: int):
    """(n_limbs, N) normal-form 16-bit limbs -> (n_windows, N) c-bit digits."""
    assert c <= 16
    out = []
    for w in range(n_windows):
        bit0 = w * c
        k, r = bit0 // 16, bit0 % 16
        d = scalars[k] >> jnp.uint32(r) if k < n_limbs else jnp.zeros_like(scalars[0])
        if r + c > 16 and k + 1 < n_limbs:
            d = d | (scalars[k + 1] << jnp.uint32(16 - r))
        out.append(d & jnp.uint32((1 << c) - 1))
    return jnp.stack(out, axis=0)


def window_digits_signed(scalars, n_limbs: int, c: int, n_windows: int):
    """Signed-digit recoding: raw c-bit digits d are mapped to
    d' in (-2^(c-1), 2^(c-1)] with a carry into the next window whenever
    d + carry > 2^(c-1) — halving the live bucket count (gnark-crypto's
    MultiExp applies the same recoding, reference Pippenger at
    /root/reference/backend/groth16/bn254/prove.go:201-290).

    Returns (mags, signs): (n_windows, N) magnitudes in [0, 2^(c-1)] and
    bool sign rows (True = subtract the point). Requires the scalar value
    < 2^(c*n_windows - 1) so the final carry cannot escape — callers pass
    field elements reduced mod r with n_windows = ceil((bits(r)+1)/c)."""
    raw = window_digits(scalars, n_limbs, c, n_windows)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)

    def step(carry, d):
        dp = d + carry
        neg = dp > half
        mag = jnp.where(neg, full - dp, dp)
        return neg.astype(jnp.uint32), (mag, neg)

    _, (mags, signs) = jax.lax.scan(step, jnp.zeros_like(raw[0]), raw)
    return mags, signs


class MSM:
    """MSM engine bound to (CurveOps, scalar Field). Works for G1 and G2."""

    STRIP_THRESHOLD = 1 << 15

    def __init__(
        self,
        ops: CurveOps,
        fr: Field,
        c: int = 16,
        strips: int = 1 << 13,
        strip_threshold: int = STRIP_THRESHOLD,
        window_batch: int = 5,
    ):
        self.ops = ops
        self.fr = fr
        self.c = c
        self.strips = strips
        self.strip_threshold = strip_threshold
        self.window_batch = window_batch
        self.scalar_bits = fr.spec.modulus.bit_length()
        # signed digits need one headroom bit for the final recoding carry
        self.n_windows = -(-(self.scalar_bits + 1) // c)
        self.nbuckets = 1 << (c - 1)  # live buckets per poly (signed)
        self._msm_j = jax.jit(self._msm_impl)
        self._many_j = jax.jit(self._msm_many_impl)

    def muls_per_point_estimate(self) -> float:
        """Montgomery-mul-equivalents per point of the CURRENT algorithm
        structure (for the measured roofline in bench.py): one complete
        mixed add per point per window (~12.5 mul-eq: 11 muls + b3 chains +
        lazy add/subs at ~0.1 mul each) plus ~10% for the hierarchical
        flush-record reduction and bucket weighting."""
        return self.n_windows * 1.10 * 12.5

    def __call__(self, points_affine, scalars_norm):
        """points: (X, Y, inf) with coords (L, N) (X/Y possibly (c0,c1) tuples
        for G2); scalars: (L, N) NORMAL-form 16-bit limbs. Returns a
        projective point with batch dim 1."""
        return self._msm_j(points_affine, scalars_norm)

    def many(self, points_affine, scalars_norm_k):
        """k MSMs over SHARED points: scalars (L, k, N) NORMAL-form limbs.
        Returns a projective point with batch dim k. One composite-key
        pipeline — k same-size MSMs cost barely more than one at small N."""
        return self._many_j(points_affine, scalars_norm_k)

    # ------------------------------------------------------------ tiny sizes
    ladder_threshold: int = 96

    def _ladder_many_impl(self, points_affine, scalars):
        """Bit ladder for tiny N: acc = 2*acc + sum(bit_i ? P_i : O), one
        lax.scan over scalar bits MSB-first. Orders of magnitude smaller
        graph than the bucket pipeline (the XLA:CPU mesh dryrun compiles the
        per-device-shard MSM; an 85-window Pippenger for an 8-point shard
        was the compile-time long pole), and tiny-N proves are launch-bound
        anyway. scalars: (L, k, N); the point coords broadcast over k."""
        ops = self.ops
        X, Y, inf = points_affine
        nbits = self.scalar_bits
        rows = []
        for b in reversed(range(nbits)):
            k_, r = divmod(b, 16)
            rows.append((scalars[k_] >> jnp.uint32(r)) & jnp.uint32(1))
        bits = jnp.stack(rows, axis=0)  # (nbits, k, N), MSB first
        # broadcast point coords over the poly axis: (L, N) -> (L, 1, N)
        Xb, Yb = tree_map(lambda a: a[:, None, :], (X, Y))
        pts = ops.from_affine((Xb, Yb, inf[None, :]))
        ident = ops.identity_like(Xb)
        kk = scalars.shape[1]
        acc_templ = tree_map(
            lambda a: jnp.broadcast_to(a[:, None, :1], (a.shape[0], kk, 1)), X
        )
        acc0 = ops.identity_like(acc_templ)

        def fold(v, m):
            while m > 1:
                if m % 2:
                    one = ops.identity_like(tree_map(lambda a: a[..., :1], v[0]))
                    v = tree_map(
                        lambda a, b: jnp.concatenate([a, b], axis=-1), v, one
                    )
                    m += 1
                half = m // 2
                v = ops.add(
                    tree_map(lambda a: a[..., :half], v),
                    tree_map(lambda a: a[..., half:], v),
                )
                m = half
            return v

        def step(acc, bit_row):
            acc = ops.double(acc)
            sel = ops.select(bit_row == 1, pts, ident)
            return ops.add(acc, fold(sel, inf.shape[-1])), None

        acc, _ = jax.lax.scan(step, acc0, bits)
        return acc

    # ------------------------------------------------------------------ impl
    def _msm_impl(self, points_affine, scalars):
        """Single-polynomial entry: (L, N) scalars -> batch-1 point."""
        out = self._msm_core(points_affine, scalars[:, None, :])
        return out

    def _msm_many_impl(self, points_affine, scalars):
        """Batched entry: (L, k, N) scalars over SHARED points -> batch-k
        point (one fused composite-key pipeline; see _msm_core)."""
        return self._msm_core(points_affine, scalars)

    def _msm_core(self, points_affine, scalars):
        """MSM of k polynomials over one shared point set.

        scalars: (L, k, N0). Returns a projective point with batch dim k.

        Signed-digit windows: magnitudes in [0, 2^(c-1)] with per-record
        signs applied by negating Y at gather time, so the live bucket
        count is B' = 2^(c-1) and c=16 covers BN254 in 16 windows.

        k > 1 uses COMPOSITE bucket keys (poly_id * B' + mag - 1): all k
        MSMs share one sort, one gather, one strip scan and one reduction
        per window, so k same-size MSMs cost barely more than one at small
        N — the PLONK prover's ~10 same-SRS KZG commits were each paying
        the full per-window launch overhead (reference counterpart: the 11
        goroutine-parallel commits in backend/plonk/bn254/prove.go:139-169)."""
        k = scalars.shape[1]
        if points_affine[2].shape[-1] <= self.ladder_threshold:
            return self._ladder_many_impl(points_affine, scalars)
        ops, c = self.ops, self.c
        Bp = 1 << (c - 1)  # live buckets per poly (signed digits)
        BK = k * Bp
        X, Y, inf = points_affine
        N0 = inf.shape[-1]
        M0 = k * N0

        # strip layout: C lanes of R sequential rows over the M0 = k*N0
        # flattened records; pad M0 to C*R with DEAD-key records
        use_strips = M0 >= self.strip_threshold
        if use_strips:
            C = min(self.strips, 1 << max(3, (M0 - 1).bit_length() - 6))
            R = -(-M0 // C)
            M = C * R
        else:
            M = M0

        mags, signs = window_digits_signed(
            scalars.reshape(self.fr.n, M0), self.fr.n, c, self.n_windows
        )
        # composite keys: poly_id * B' + (mag - 1); zero digits and
        # infinity inputs land in the shared DEAD key (sorted after all
        # live records, dropped by every scatter)
        inf_flat = jnp.tile(inf, k) if k > 1 else inf
        poly_off = (
            (jnp.arange(M0, dtype=jnp.uint32) // jnp.uint32(N0)) * jnp.uint32(Bp)
            if k > 1
            else jnp.uint32(0)
        )
        DEAD = jnp.uint32(BK)
        live = (mags > 0) & ~inf_flat[None, :]
        digits = jnp.where(live, (mags - 1) + poly_off, DEAD)
        if M != M0:
            digits = jnp.pad(digits, ((0, 0), (0, M - M0)), constant_values=BK)
            signs = jnp.pad(signs, ((0, 0), (0, M - M0)))

        # ---- packed point image, permuted by CO-SORT --------------------
        # Limbs are 16-bit values in u32 lanes — half the moved bits would
        # be zeros — so pack limb pairs into full u32 ROWS of a
        # (L_total/2, M) image once per MSM, and permute points into
        # sorted-by-digit order by passing the rows as PAYLOAD operands of
        # ONE variadic lax.sort per window. Measured on v5e at 2^20: the
        # co-sort moves key+sign+16 payload rows in ~8.5 ms/window, vs
        # ~25 ms for argsort followed by a minor-axis gather (TPU random
        # gathers run at ~2.8 GB/s regardless of layout; the sort network
        # moves payload ~3x faster) — and it subsumes the separate key and
        # sign gathers (~16 ms/window) the gather formulation needed.
        # Infinity inputs need no mask here: they carry the DEAD key, so
        # whatever their (0, 1) placeholder coordinates accumulate lands in
        # the dropped DEAD segment.
        if use_strips:
            xy_leaves, xy_tree = jax.tree_util.tree_flatten((X, Y))
            leaf_rows = [l.shape[0] for l in xy_leaves]
            allc = jnp.concatenate(xy_leaves, axis=0)  # (Ltot, N0)
            packed = allc[0::2] | (allc[1::2] << jnp.uint32(16))
            Ltot = allc.shape[0]
            if k > 1:
                packed = jnp.tile(packed, (1, k))
            if M != M0:
                packed = jnp.pad(packed, ((0, 0), (0, M - M0)))
            packed_rows = tuple(packed[i] for i in range(packed.shape[0]))

            def unpack_rows(sorted_rows):
                g = jnp.stack(sorted_rows, axis=0)  # (Ltot//2, M)
                lo = g & jnp.uint32(0xFFFF)
                hi = g >> jnp.uint32(16)
                full = jnp.stack([lo, hi], axis=1).reshape(Ltot, M)
                leaves2, ofs = [], 0
                for r in leaf_rows:
                    leaves2.append(full[ofs : ofs + r])
                    ofs += r
                return jax.tree_util.tree_unflatten(xy_tree, leaves2)
        else:
            # flat (tiled) affine image for the direct log-scan path
            if k > 1:
                aff0 = tree_map(
                    lambda a: jnp.tile(a, (1,) * (a.ndim - 1) + (k,)), (X, Y)
                ) + (jnp.tile(inf, k),)
                aff0 = (aff0[0], aff0[1], aff0[2])
            else:
                aff0 = (X, Y, inf)

        def fold_sum(vals, m: int):
            """Sum m points along the trailing axis: shape-preserving
            log2(m)-round fold (ONE add in the graph, via fori_loop). Result
            in slot [..., 0:1]."""
            if m == 1:
                return vals
            rounds = (m - 1).bit_length()
            iota_m = jnp.arange(m, dtype=jnp.int32)

            def body(r, st):
                vals, width = st
                half = (width + 1) // 2
                shifted = tree_map(lambda a: jnp.roll(a, -half, axis=-1), vals)
                valid = (iota_m + half) < width
                vals = ops.select(valid, ops.add(vals, shifted), vals)
                return (vals, half)

            vals, _ = jax.lax.fori_loop(0, rounds, body, (vals, jnp.int32(m)))
            return tree_map(lambda a: a[..., :1], vals)

        def log_scan_buckets(skey, pts, m, nbuckets, sent):
            """Segmented Hillis-Steele scan over m sorted records + scatter
            of the segment-end sums into nbuckets slots (keys >= nbuckets
            — DEAD, pad, sentinel — land in the dropped overflow slots)."""
            iota_m = jnp.arange(m, dtype=jnp.int32)
            rounds = max((m - 1).bit_length(), 0)

            def seg_round(r, pts):
                d = jnp.int32(1) << r
                shifted = tree_map(lambda a: jnp.roll(a, d, axis=-1), pts)
                kshift = jnp.roll(skey, d)
                same = (iota_m >= d) & (kshift == skey)
                return ops.select(same, ops.add(pts, shifted), pts)

            pts = jax.lax.fori_loop(0, rounds, seg_round, pts)
            is_end = jnp.concatenate([skey[:-1] != skey[1:], jnp.array([True])])
            sidx = jnp.where(is_end, skey, jnp.uint32(sent)).astype(jnp.int32)
            sidx = jnp.minimum(sidx, jnp.int32(nbuckets + 1))
            x_templ = tree_map(
                lambda a: jnp.zeros(a.shape[:-1] + (nbuckets + 2,), a.dtype),
                pts[0],
            )
            ident_base = ops.identity_like(x_templ)
            return tree_map(
                lambda ini, a: ini.at[..., sidx].set(a)[..., :nbuckets],
                ident_base,
                pts,
            )

        def strip_flush(skey, pts, Cs, Rs, sent, mixed):
            """Strip accumulation pass: Cs strips of Rs sequential rows, one
            Cs-wide add per row, flush records at key boundaries. Returns
            ((R+1)*C,) flush keys + projective flush points (trailing batch
            axis), garbage rows keyed `sent`. `mixed`: pts is the gathered
            AFFINE (X, Y, inf) triple (mixed adds save a coordinate gather
            and a field mul per add); else projective records (full adds)."""
            keys2 = skey.reshape(Cs, Rs)
            pts2 = tree_map(lambda a: a.reshape(a.shape[:-1] + (Cs, Rs)), pts)
            xs = (
                jnp.moveaxis(keys2, -1, 0),  # (R, C)
                tree_map(lambda a: jnp.moveaxis(a, -1, 0), pts2),  # (R, .., C)
            )
            ident_c = ops.identity_like(
                tree_map(
                    lambda a: a.reshape(a.shape[:-1] + (Cs, Rs))[..., 0], pts[0]
                )
            )
            sentv = jnp.uint32(sent)

            def step(carry, x):
                acc, acc_key = carry
                kk, pt = x
                same = kk == acc_key
                if mixed:
                    new_acc = ops.select(
                        same, ops.add_mixed(acc, pt), ops.from_affine(pt)
                    )
                else:
                    new_acc = ops.select(same, ops.add(acc, pt), pt)
                fkey = jnp.where(same, sentv, acc_key)
                return (new_acc, kk), (fkey, acc)

            (acc, acc_key), (fkeys, fpts) = jax.lax.scan(
                step, (ident_c, jnp.full((Cs,), sentv, dtype=skey.dtype)), xs
            )
            # append the final per-strip flush
            fkeys = jnp.concatenate([fkeys, acc_key[None]], axis=0)  # (R+1, C)
            fpts = tree_map(
                lambda ys, fin: jnp.concatenate([ys, fin[None]], axis=0),
                fpts,
                acc,
            )
            Mrec = (Rs + 1) * Cs
            fkeys = fkeys.reshape(Mrec)
            # records back to trailing batch axis: (R+1, .., C) -> (.., Mrec)
            fpts = tree_map(
                lambda a: jnp.moveaxis(a, 0, -2).reshape(a.shape[1:-1] + (Mrec,)),
                fpts,
            )
            return fkeys, fpts

        def strip_reduce(skey, pts, m, nbuckets, sent):
            """Sorted projective records -> nbuckets bucket sums via one
            strip pass + a small log-scan over the <= nbuckets + C2
            survivors (the flat log-scan over m records costs O(m log m)
            full adds; this is O(m + nbuckets log nbuckets))."""
            C2 = max(128, min(1024, 1 << max(0, (m - 1).bit_length() - 5)))
            R2 = -(-m // C2)
            M2 = C2 * R2
            if M2 != m:
                skey = jnp.pad(skey, (0, M2 - m), constant_values=sent)
                pad = [(0, 0)] * (pts[0].ndim - 1) + [(0, M2 - m)]
                pts = tree_map(lambda a: jnp.pad(a, pad), pts)
            fkeys, fpts = strip_flush(skey, pts, C2, R2, sent, mixed=False)
            K2 = min((R2 + 1) * C2, nbuckets + C2)
            ridx = jnp.argsort(fkeys)[:K2]
            skey2 = fkeys[ridx]
            pts2 = tree_map(lambda a: a[..., ridx], fpts)
            return log_scan_buckets(skey2, pts2, K2, nbuckets, sent)

        def small_weighted(vals, m):
            """sum_b b * vals[b] over a SMALL m: suffix scan (all suffixes)
            then sum of suffixes 1..m-1."""
            iota_m = jnp.arange(m, dtype=jnp.int32)
            rounds = (m - 1).bit_length()

            def suf_round(r, bk):
                d = jnp.int32(1) << r
                shifted = tree_map(lambda a: jnp.roll(a, -d, axis=-1), bk)
                valid = iota_m < m - d
                return ops.select(valid, ops.add(bk, shifted), bk)

            vals = jax.lax.fori_loop(0, rounds, suf_round, vals)
            mask = iota_m >= 1
            ident = ops.identity_like(vals[0])
            vals = ops.select(mask, vals, ident)
            return fold_sum(vals, m)

        # weighted bucket sum over 0-based keys m holding S_m with weight
        # (m + 1): radix split m = Bl*hi + lo gives
        #   sum_m (m+1)*S_m = Bl*sum_hi hi*rowsum[hi] + sum_lo lo*colsum[lo]
        #                     + sum_m S_m
        # cost ~2B' tree adds + two tiny weighted sums + one tiny fold.
        Bl = 1 << ((c - 1) // 2)
        Bh = Bp // Bl

        def weighted_buckets(buckets):
            S = tree_map(lambda a: a.reshape(a.shape[:-1] + (Bh, Bl)), buckets)
            rows = fold_sum(S, Bl)  # (..., Bh, 1)
            rows = tree_map(lambda a: a[..., 0], rows)  # (..., Bh)
            cols = tree_map(lambda a: jnp.moveaxis(a, -1, -2), S)  # (..., Bl, Bh)
            cols = fold_sum(cols, Bh)
            cols = tree_map(lambda a: a[..., 0], cols)  # (..., Bl)
            w_hi = small_weighted(rows, Bh)  # (..., 1)
            w_lo = small_weighted(cols, Bl)
            total = fold_sum(rows, Bh)  # sum of ALL buckets (the +1 term)
            # w_hi *= Bl (log2(Bl) doublings, one double in the graph)
            w_hi = jax.lax.fori_loop(
                0, max(Bl.bit_length() - 1, 0), lambda i, a: ops.double(a), w_hi
            )
            return ops.add(ops.add(w_hi, w_lo), total)

        def weighted_from_records(fkeys, fpts):
            """Flush records -> per-poly weighted sums WITHOUT materializing
            the k*B' bucket array: weight m+1 = 256*u + (v+1) with
            m = 256u + v, so two small bucket spaces (k*(B'/256) hi slots,
            k*256 lo slots) each reachable by a cheap strip pass + scan.
            The flat alternative (log-scan over kB'+C records into kB'
            buckets) costs O(kB' log kB') full adds per window — at c=16
            that's 3x the strip phase itself."""
            nh = Bp >> 8  # hi slots per poly
            Mrec = fkeys.shape[0]
            K = min(Mrec, BK + C)
            ridx = jnp.argsort(fkeys)[:K]
            skey = fkeys[ridx]
            pts = tree_map(lambda a: a[..., ridx], fpts)
            # --- hi part: records sorted by key are sorted by key>>8 -----
            # live key = poly*B' + m -> key>>8 = poly*nh + (m>>8); DEAD/SENT
            # shift into the dropped overflow slots.
            hkey = skey >> jnp.uint32(8)
            S_hi = strip_reduce(hkey, pts, K, k * nh, k * nh + 1)
            S_hi = tree_map(lambda a: a.reshape(a.shape[:-1] + (k, nh)), S_hi)
            w_hi = small_weighted(S_hi, nh)  # (.., k, 1): sum u*S
            # --- lo part: re-sort by poly*256 + (m & 255) ----------------
            is_live = skey < jnp.uint32(BK)
            poly = skey >> jnp.uint32(c - 1)  # B' = 2^(c-1)
            lkey = jnp.where(
                is_live,
                poly * jnp.uint32(256) + (skey & jnp.uint32(255)),
                jnp.uint32(k * 256),
            )
            lidx = jnp.argsort(lkey)
            lkey2 = lkey[lidx]
            pts_l = tree_map(lambda a: a[..., lidx], pts)
            S_lo = strip_reduce(lkey2, pts_l, K, k * 256, k * 256 + 1)
            S_lo = tree_map(lambda a: a.reshape(a.shape[:-1] + (k, 256)), S_lo)
            w_lo = small_weighted(S_lo, 256)  # (.., k, 1): sum v*S
            total = fold_sum(S_lo, 256)  # (.., k, 1): sum S (the +1 term)
            # combine: 256*w_hi + w_lo + total
            w_hi = jax.lax.fori_loop(0, 8, lambda i, a: ops.double(a), w_hi)
            out = ops.add(ops.add(w_hi, w_lo), total)
            return tree_map(lambda a: a[..., 0], out)  # (.., k)

        debug_stop = getattr(self, "_debug_stop", None)

        def per_window(xs):
            key, sign = xs
            if use_strips:
                outs = jax.lax.sort(
                    (key, sign.astype(jnp.uint32)) + packed_rows, num_keys=1
                )
                skey, ssgn = outs[0], outs[1]
                Xg, Yg = unpack_rows(outs[2:])
                Yg = ops.fa.select(ssgn == 1, ops.fa.neg(Yg), Yg)
                if debug_stop == "gather":  # phase profiling (scripts/)
                    z = ops.from_affine((Xg, Yg))
                    return tree_map(
                        lambda a: jnp.broadcast_to(
                            a[..., :1], a.shape[:-1] + (k,)
                        ),
                        z,
                    )
                fkeys, fpts = strip_flush(
                    skey, (Xg, Yg), C, R, BK + 1, mixed=True
                )
                if debug_stop == "strip":
                    return tree_map(
                        lambda a: jnp.broadcast_to(
                            a[..., :1], a.shape[:-1] + (k,)
                        ),
                        fpts,
                    )
                if c - 1 > 8 and Bp >= 1024:
                    return weighted_from_records(fkeys, fpts)
                K = min((R + 1) * C, BK + C)
                ridx = jnp.argsort(fkeys)[:K]
                buckets = log_scan_buckets(
                    fkeys[ridx],
                    tree_map(lambda a: a[..., ridx], fpts),
                    K,
                    BK,
                    BK + 1,
                )
            else:
                order = jnp.argsort(key)
                skey = key[order]
                sgn = sign[order]
                X0, Y0, inf0 = aff0
                pts = ops.from_affine(
                    tree_map(lambda a: a[..., order], (X0, Y0))
                    + (inf0[..., order],)
                )
                Yn = ops.fa.select(sgn, ops.fa.neg(pts[1]), pts[1])
                pts = (pts[0], Yn, pts[2])
                buckets = log_scan_buckets(skey, pts, M, BK, BK + 1)
            # (.., kB') -> (.., k, B'): per-poly weighting, batch-k point out
            buckets = tree_map(
                lambda a: a.reshape(a.shape[:-1] + (k, Bp)), buckets
            )
            out = weighted_buckets(buckets)  # (.., k, 1)
            return tree_map(lambda a: a[..., 0], out)  # (.., k)

        # Window scheduling is backend-dependent (decided at trace time):
        #  * TPU: sequential windows (lax.scan). The per-step work runs as
        #    fused Pallas kernels that are already lane-saturated at
        #    C-strip width; vmapping pallas_call produces squeezed block
        #    shapes Mosaic rejects, and dispatch latency is no longer the
        #    bottleneck once each step is ONE kernel.
        #  * CPU/other: windows in vmapped batches — the plain-XLA pipeline
        #    is kernel-launch-latency-bound, so sharing kernels across
        #    window_batch windows is a near-linear speedup. Pick the largest
        #    batch <= window_batch that DIVIDES n_windows (a remainder chunk
        #    would compile a second program).
        if jax.default_backend() == "tpu":
            wsums = jax.lax.map(per_window, (digits, signs))
        else:
            wb = 1
            for d in range(1, min(self.window_batch, self.n_windows) + 1):
                if self.n_windows % d == 0:
                    wb = d
            wsums = jax.lax.map(per_window, (digits, signs), batch_size=wb)

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
