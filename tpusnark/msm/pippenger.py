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
        # BW6-761: G2 is a sextic twist over Fp itself -> G1-style kernels
        ops = g1_ops_fused(fp, b=cfg.g2_b)
    else:
        ops = g2_ops_fused(fp, b3=cfg.g2_b3, q=cfg.fp2_q)
    return MSM(ops, fr, c=c)


def auto_c(n_points: int) -> int:
    """Pippenger window size for n points: ~log2(n), clamped. The bucket
    scans cost O(2^c) lanes x c rounds per window, so oversizing c for small
    n wastes orders of magnitude of work (gnark-crypto picks c from n the
    same way in MultiExpConfig)."""
    return max(2, min(13, max(1, n_points).bit_length() - 1))


def get_msm_for(curve: str, n_points: int, curve_name: str = "bn254") -> "MSM":
    """MSM engine with window size adapted to the problem size."""
    return get_msm(curve, auto_c(n_points), curve_name)


def auto_c_many(n_points: int, k: int, scalar_bits: int = 254) -> int:
    """Window size for a k-polynomial composite MSM: minimize the modeled
    per-MSM cost W(c) * [strip adds + compaction log-scan over kB + C slots
    + weighting ~2kB], which pushes c DOWN as k grows (the compaction and
    weighting phases scale with k * 2^c while the strip adds don't)."""
    M0 = k * max(1, n_points)
    best_c, best_cost = 2, float("inf")
    for c in range(4, 17):
        W = -(-scalar_bits // c)
        B = 1 << c
        C = min(1 << 13, 1 << max(3, (M0 - 1).bit_length() - 6))
        K = k * B + C
        cost = W * (
            M0 * 12.5  # strip mixed adds
            + K * max(1, (K - 1).bit_length()) * 14  # compaction log-scan
            + 2 * k * B * 14  # bucket weighting
        )
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
        d = scalars[k] >> jnp.uint32(r)
        if r + c > 16 and k + 1 < n_limbs:
            d = d | (scalars[k + 1] << jnp.uint32(16 - r))
        out.append(d & jnp.uint32((1 << c) - 1))
    return jnp.stack(out, axis=0)


class MSM:
    """MSM engine bound to (CurveOps, scalar Field). Works for G1 and G2."""

    def __init__(
        self,
        ops: CurveOps,
        fr: Field,
        c: int = 13,
        strips: int = 1 << 13,
        strip_threshold: int = 1 << 15,
        window_batch: int = 5,
    ):
        self.ops = ops
        self.fr = fr
        self.c = c
        self.strips = strips
        self.strip_threshold = strip_threshold
        self.window_batch = window_batch
        self.scalar_bits = fr.spec.modulus.bit_length()
        self.n_windows = -(-self.scalar_bits // c)
        self._msm_j = jax.jit(self._msm_impl)
        self._many_j = jax.jit(self._msm_many_impl)

    def muls_per_point_estimate(self) -> float:
        """Montgomery-mul-equivalents per point of the CURRENT algorithm
        structure (for the measured roofline in bench.py): one complete
        mixed add per point per window (~12.5 mul-eq: 11 muls + b3 chains +
        lazy add/subs at ~0.1 mul each) plus ~25% for the compaction
        log-scan and bucket weighting."""
        return self.n_windows * 1.25 * 12.5

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

        k > 1 uses COMPOSITE bucket keys (poly_id * B + digit): all k MSMs
        share one sort, one gather, one strip scan and one compaction per
        window, so k same-size MSMs cost barely more than one at small N —
        the PLONK prover's ~10 same-SRS KZG commits were each paying the
        full per-window launch overhead (reference counterpart: the 11
        goroutine-parallel commits in backend/plonk/bn254/prove.go:139-169)."""
        k = scalars.shape[1]
        if points_affine[2].shape[-1] <= self.ladder_threshold:
            return self._ladder_many_impl(points_affine, scalars)
        ops, c = self.ops, self.c
        B = 1 << c
        BK = k * B
        X, Y, inf = points_affine
        N0 = inf.shape[-1]
        M0 = k * N0

        # strip layout: C lanes of R sequential rows over the M0 = k*N0
        # flattened records; pad M0 to C*R with key-0 records (the ignored
        # weight-0 bucket of poly 0)
        use_strips = M0 >= self.strip_threshold
        if use_strips:
            # R >= 64 rows per strip: the compaction log-scan costs
            # O((kB + C) log(kB + C)) adds per window, so keep C small
            # relative to M0 (M0/64) while bounded by self.strips
            C = min(self.strips, 1 << max(3, (M0 - 1).bit_length() - 6))
            R = -(-M0 // C)
            M = C * R
        else:
            M = M0

        digits = window_digits(
            scalars.reshape(self.fr.n, M0), self.fr.n, c, self.n_windows
        )
        # composite keys: poly_id * B + digit; infinity inputs land in their
        # poly's (ignored, weight-0) 0 bucket
        inf_flat = jnp.tile(inf, k) if k > 1 else inf
        poly_off = (
            (jnp.arange(M0, dtype=jnp.uint32) // jnp.uint32(N0)) * jnp.uint32(B)
            if k > 1
            else jnp.uint32(0)
        )
        digits = jnp.where(inf_flat[None, :], jnp.uint32(0), digits) + poly_off
        if M != M0:
            digits = jnp.pad(digits, ((0, 0), (0, M - M0)))

        # ---- packed point image for the per-window permutation ----------
        # The sorted-order point gather dominated the MSM (61 ms/window at
        # 2^20 on v5e): TPU random gathers run at ~2-3 GB/s regardless of
        # axis, so the fix is to SHRINK THE GATHERED BYTES. Limbs are 16-bit
        # values stored in u32 lanes — half the gathered bits were zeros.
        # Pack limb pairs into full u32 rows ((N0, L_total/2), 64 B/point
        # for G1) once per MSM; each window row-gathers the packed image
        # (29.6 ms measured at 2^20) and unpacks with cheap wide shifts.
        # Record j's point is j mod N0 (records are poly-major).
        if use_strips:
            xy_leaves, xy_tree = jax.tree_util.tree_flatten((X, Y))
            leaf_rows = [l.shape[0] for l in xy_leaves]
            allc = jnp.concatenate(xy_leaves, axis=0)  # (Ltot, N0)
            packed = (allc[0::2] | (allc[1::2] << jnp.uint32(16))).T
            Ltot = allc.shape[0]

            def gather_points(order):
                pidx = order % N0 if (k > 1 or M != M0) else order
                g = packed[pidx]  # (M, Ltot//2) contiguous-row gather
                gt = g.T
                lo = gt & jnp.uint32(0xFFFF)
                hi = gt >> jnp.uint32(16)
                full = jnp.stack([lo, hi], axis=1).reshape(Ltot, M)
                leaves2, ofs = [], 0
                for r in leaf_rows:
                    leaves2.append(full[ofs : ofs + r])
                    ofs += r
                Xg, Yg = jax.tree_util.tree_unflatten(xy_tree, leaves2)
                return (Xg, Yg, inf[pidx])
        else:
            # flat (tiled) affine image for the direct log-scan path
            if k > 1:
                aff0 = tree_map(
                    lambda a: jnp.tile(a, (1,) * (a.ndim - 1) + (k,)), (X, Y)
                ) + (jnp.tile(inf, k),)
                aff0 = (aff0[0], aff0[1], aff0[2])
            else:
                aff0 = (X, Y, inf)

        SENT = jnp.uint32(BK)  # sorts after every real bucket key

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

        def log_scan_buckets(skey, pts, m):
            """Segmented Hillis-Steele scan over m sorted records + scatter
            of the segment-end sums into the kB+1 bucket slots."""
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
            sidx = jnp.where(is_end, skey, SENT).astype(jnp.int32)
            x_templ = tree_map(
                lambda a: jnp.zeros(a.shape[:-1] + (BK + 1,), a.dtype), pts[0]
            )
            ident_base = ops.identity_like(x_templ)
            return tree_map(
                lambda ini, a: ini.at[..., sidx].set(a)[..., :BK], ident_base, pts
            )

        def strip_buckets(skey, aff):
            """O(N)-adds accumulation: strips of R sequential rows, one
            C-wide mixed add per row, flush records at key boundaries,
            compact by an integer sort, reduce the <= B + C survivors with
            the log-scan. `aff` is the gathered AFFINE (X, Y, inf) triple —
            mixed adds save a coordinate gather and a field mul per add."""
            keys2 = skey.reshape(C, R)
            aff2 = tree_map(lambda a: a.reshape(a.shape[:-1] + (C, R)), aff)
            xs = (
                jnp.moveaxis(keys2, -1, 0),  # (R, C)
                tree_map(lambda a: jnp.moveaxis(a, -1, 0), aff2),  # (R, ..., C)
            )
            ident_c = ops.identity_like(tree_map(lambda a: a[..., 0], aff2[0]))

            def step(carry, x):
                acc, acc_key = carry
                k, pt = x
                same = k == acc_key
                new_acc = ops.select(
                    same, ops.add_mixed(acc, pt), ops.from_affine(pt)
                )
                fkey = jnp.where(same, SENT, acc_key)
                return (new_acc, k), (fkey, acc)

            (acc, acc_key), (fkeys, fpts) = jax.lax.scan(
                step, (ident_c, jnp.full((C,), SENT, dtype=skey.dtype)), xs
            )
            # append the final per-strip flush
            fkeys = jnp.concatenate([fkeys, acc_key[None]], axis=0)  # (R+1, C)
            fpts = tree_map(
                lambda ys, fin: jnp.concatenate([ys, fin[None]], axis=0), fpts, acc
            )
            Mrec = (R + 1) * C
            fkeys = fkeys.reshape(Mrec)
            # records back to trailing batch axis: (R+1, ..., C) -> (..., Mrec)
            fpts = tree_map(
                lambda a: jnp.moveaxis(a, 0, -2).reshape(a.shape[1:-1] + (Mrec,)),
                fpts,
            )
            K = min(Mrec, BK + C)
            ridx = jnp.argsort(fkeys)[:K]
            skey2 = fkeys[ridx]
            pts3 = tree_map(lambda a: a[..., ridx], fpts)
            return log_scan_buckets(skey2, pts3, K)

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

        # weighted bucket sum via radix split b = Bl*hi + lo:
        #   sum_b b*S_b = Bl * sum_hi hi*rowsum[hi] + sum_lo lo*colsum[lo]
        # cost ~2B tree adds + two tiny weighted sums, vs 15B for the
        # full suffix-scan formulation (bucket 0 drops out by weight).
        Bl = 1 << (c // 2)
        Bh = B // Bl

        def weighted_buckets(buckets):
            S = tree_map(lambda a: a.reshape(a.shape[:-1] + (Bh, Bl)), buckets)
            rows = fold_sum(S, Bl)  # (..., Bh, 1)
            rows = tree_map(lambda a: a[..., 0], rows)  # (..., Bh)
            cols = tree_map(lambda a: jnp.moveaxis(a, -1, -2), S)  # (..., Bl, Bh)
            cols = fold_sum(cols, Bh)
            cols = tree_map(lambda a: a[..., 0], cols)  # (..., Bl)
            w_hi = small_weighted(rows, Bh)  # (..., 1)
            w_lo = small_weighted(cols, Bl)
            # w_hi *= Bl (log2(Bl) doublings, one double in the graph)
            w_hi = jax.lax.fori_loop(
                0, Bl.bit_length() - 1, lambda i, a: ops.double(a), w_hi
            )
            return ops.add(w_hi, w_lo)

        def per_window(key):
            order = jnp.argsort(key)
            skey = key[order]
            if use_strips:
                aff = gather_points(order)
                buckets = strip_buckets(skey, aff)
            else:
                pts = tree_map(lambda a: a[..., order], ops.from_affine(aff0))
                buckets = log_scan_buckets(skey, pts, M)
            # (.., kB) -> (.., k, B): per-poly weighting, batch-k point out
            buckets = tree_map(
                lambda a: a.reshape(a.shape[:-1] + (k, B)), buckets
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
            wsums = jax.lax.map(per_window, digits)
        else:
            wb = 1
            for d in range(1, min(self.window_batch, self.n_windows) + 1):
                if self.n_windows % d == 0:
                    wb = d
            wsums = jax.lax.map(per_window, digits, batch_size=wb)

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
