"""Batched modular (Montgomery) limb arithmetic in JAX for TPU.

Replaces gnark-crypto's generated 4x64-bit Montgomery assembly (SURVEY.md §2.5,
reference call sites: /root/reference/constraint/bn254/solver.go:35,
/root/reference/backend/groth16/bn254/setup.go:128) with a TPU-native design:

  * field elements = ``(n_limbs, *batch)`` uint32 arrays, base 2^16
    little-endian. Limb axis is LEADING so the (large) batch dimension is
    minor-most and maps onto the 128-wide VPU lanes; a trailing 16-limb axis
    would be padded 16->128 on TPU (8x waste).
  * the TPU VPU has no 64-bit lanes; 16x16->32 products never overflow a lane
  * Montgomery form throughout. Multiplication is **full-word Montgomery**:
    one schoolbook limb product a*b, one low-half product with
    P' = -p^-1 mod R (R = 2^(16n)), one full product m*p, then
    (T + m*p)/R — NO per-limb sequential REDC loop. Limb products are
    antidiagonal sums of the 16x16->32 outer product, computed as a matmul
    with a constant 0/1 selection matrix: exact in f32 (values < 2^20, and
    the 0/1 side is exact in bf16, so even TPU bf16x3 f32 matmuls are exact),
    MXU-eligible, and only a handful of XLA ops (the previous
    dynamic_update_slice formulation took XLA:CPU ~6 minutes to compile one
    MSM; this one compiles in seconds).
  * **lazy range [0, 2p)**: mul/add/sub outputs stay < 2p, not < p (standard
    SIMD-Montgomery trick; sound because 4p < R). Comparisons canonicalize.
    Encoders emit canonical (< p) values; decode reduces mod p.
  * wide accumulations (segment sums for sparse matvec / linear-expression
    evaluation) keep lazily-unreduced 32-bit columns and reduce once at the end
  * the same code runs inside Pallas kernels (it is pure jnp)

Everything is shape-polymorphic over trailing batch dims and closed over a
:class:`~tpusnark.fields.spec.FieldSpec` (no per-curve codegen, unlike the
reference's internal/generator).
"""

from __future__ import annotations

import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np

# Trace-time switch: inside a Pallas kernel the antidiagonal sums use the
# skew-reshape (pure u32 VPU; Mosaic cannot lower the f32 dot path exactly
# and the conversions are dead weight in VMEM), while the plain XLA path
# keeps the 0/1-selection-matrix matmul (XLA:TPU fuses it well; the skew
# variant measured 5x SLOWER un-fused at batch 2^20). `fuse` sets this
# around kernel tracing.
IN_PALLAS = contextvars.ContextVar("tpusnark_in_pallas", default=False)

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs

MASK = np.uint32(LIMB_MASK)
SHIFT = LIMB_BITS


def _u32(x: int) -> np.uint32:
    return np.uint32(x & 0xFFFFFFFF)


# Trace-time switch for the MXU constant-multiply path outside Pallas (CPU
# unit tests force it; inside kernels IN_PALLAS gates it).
FORCE_MXU_CONST_MUL = contextvars.ContextVar("tpusnark_force_mxu", default=False)

# In-kernel antidiagonal strategy: True routes the phase-1 antidiagonal sums
# through the MXU (0/1 selection-matrix matmul) instead of the VPU
# skew-reshape log-tree. Default SKEW: measured on the v5e chip (round 5),
# the in-kernel skew path sustains 307 M muls/s vs 278 M for the MXU route —
# the f32 HIGHEST-precision selection matmul saturates the MXU with 4x
# row-padding waste (31 useful rows of 128) while the VPU sits underused.
# TPUSNARK_ANTIDIAG=mxu flips it back for A/B runs.
import os as _os

ANTIDIAG_MXU = contextvars.ContextVar(
    "tpusnark_antidiag_mxu",
    default=_os.environ.get("TPUSNARK_ANTIDIAG", "skew") == "mxu",
)


def _const_band_mats(c: int, n: int, n_out16: int):
    """Even/odd band matrices of the host constant c for the MXU
    multiply-by-constant (see Field._const_mul_cols_mxu).

    c8 = base-2^8 little-endian digits of c (2n of them). Row r of the input
    is the r-th 8-bit digit of x (weight 2^(8r)); output base-2^8 column m
    of x*c is sum_r x8[r] * c8[m - r]. We emit base-2^16 columns directly:
      M_ev[k, r] = c8[2k - r]       (8-bit column 2k)
      M_od[k, r] = c8[2k + 1 - r]   (8-bit column 2k+1, weighted 2^8 later)
    Entries < 2^8 are exact in bf16; the MXU accumulates in f32, and the
    sums stay < 2n * 255^2 < 2^21 < 2^24, so the matmul is EXACT."""
    n8 = 2 * n
    c8 = [(c >> (8 * j)) & 0xFF for j in range(n8)]
    ev = np.zeros((n_out16, n8), dtype=np.float32)
    od = np.zeros((n_out16, n8), dtype=np.float32)
    for k in range(n_out16):
        for r in range(n8):
            j = 2 * k - r
            if 0 <= j < n8:
                ev[k, r] = c8[j]
            j += 1
            if 0 <= j < n8:
                od[k, r] = c8[j]
    import jax.numpy as _jnp

    return (
        np.asarray(ev, dtype=_jnp.bfloat16),
        np.asarray(od, dtype=_jnp.bfloat16),
    )


class Field:
    """JAX limb arithmetic bound to one FieldSpec. All ops are pure jnp.

    Array convention: limb axis first, shape (n_limbs, *batch).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.n = spec.n_limbs
        p = spec.modulus
        self._p_cols = [_u32(l) for l in int_to_limbs(p, self.n)]
        self._2p_cols = [_u32(l) for l in int_to_limbs(2 * p, self.n)]
        self._pprime = _u32(spec.pprime)
        # 2^(16k) mod p for folding wide values, k up to 4*n is plenty
        self._fold = [int((1 << (SHIFT * k)) % p) for k in range(4 * self.n + 4)]
        self._r2 = self.const(spec.r2, mont=False)
        self._one_mont = self.const(spec.one_mont, mont=False)
        self._zero = self.const(0, mont=False)
        # --- full-word Montgomery constants -----------------------------
        n = self.n
        # antidiagonal selection matrix: SEL[k, i*n + j] = 1 iff i + j == k.
        # 0/1-valued => the f32 matmul is exact even under TPU bf16x3 passes.
        sel = np.zeros((2 * n - 1, n * n), dtype=np.float32)
        for i in range(n):
            for j in range(n):
                sel[i + j, i * n + j] = 1.0
        self._sel_full = jnp.asarray(sel)
        self._sel_low = jnp.asarray(sel[:n].copy())  # rows k < n (mod-R product)
        self._pprime_limbs = jnp.asarray(int_to_limbs(spec.pprime_full, n))
        self._p_limbs_arr = jnp.asarray(int_to_limbs(p, n))
        R_full = 1 << (SHIFT * n)
        self._2p_limbs_arr = jnp.asarray(int_to_limbs(2 * p, n))
        self._r_minus_p = jnp.asarray(int_to_limbs(R_full - p, n))
        self._r_minus_2p = jnp.asarray(int_to_limbs(R_full - 2 * p, n))
        # per-COLUMN constant for sub(): col_i = 2p_i + 0xffff (+1 at col 0),
        # so a + const - b  ==  a - b + 2p + R in column arithmetic (see sub())
        sub_cols = int_to_limbs(2 * p, n).astype(np.uint64) + LIMB_MASK
        sub_cols[0] += 1
        self._sub_const = jnp.asarray(sub_cols.astype(np.uint32))
        self._fused: dict = {}
        # --- MXU constant-multiply matrices (see _const_mul_cols_mxu) -----
        # Montgomery phases 2 (m = t_lo * P' mod R) and 3 (m * p) multiply by
        # HOST CONSTANTS; a multiply-by-constant over limbs is a matmul with
        # a constant band matrix, which the MXU does for free while the VPU
        # does the expensive data*data phase 1. Stored as numpy (trace-safe
        # for the fuse kernel const path); bf16 8-bit digits are exact.
        self._mxu_mats = {
            "pprime_low": _const_band_mats(spec.pprime_full, n, n),
            "p_full": _const_band_mats(p, n, 2 * n),
        }

    # ------------------------------------------------------------------ utils
    def const(self, x: int, mont: bool = False) -> jnp.ndarray:
        """A (n_limbs,) device constant. If mont, stores x*R mod p."""
        if mont:
            x = self.spec.to_mont_int(x)
        return jnp.asarray(int_to_limbs(int(x) % self.spec.modulus, self.n))

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros((self.n, *shape), dtype=jnp.uint32)

    @property
    def one(self) -> jnp.ndarray:
        return self._one_mont

    def array(self, xs, mont: bool = True) -> jnp.ndarray:
        """Python ints -> (n_limbs, len(xs)) device array."""
        return jnp.asarray(self.spec.encode(list(xs), mont=mont).T.copy())

    def to_ints(self, a, mont: bool = True):
        """(n_limbs, *batch) -> flat list of ints (batch row-major)."""
        arr = np.asarray(a)
        arr = np.moveaxis(arr, 0, -1)  # (..., n_limbs)
        return self.spec.decode(arr.reshape(-1, self.n), mont=mont)

    # ----------------------------------------------------------- column plumbing
    @staticmethod
    def _cols(a):
        return [a[i] for i in range(a.shape[0])]

    @staticmethod
    def _stack(cols):
        return jnp.stack(cols, axis=0)

    @staticmethod
    def _carry_prop(cols):
        """Propagate carries through u32 columns -> 16-bit limbs + final carry.

        (List-of-columns form; used by the generic wide reducer. The hot paths
        use the vectorized Kogge-Stone `_prop` below.)"""
        out = []
        carry = None
        for c in cols:
            v = c if carry is None else c + carry
            out.append(v & MASK)
            carry = v >> SHIFT
        return out, carry

    def _sub_p_if_ge(self, limbs, p_cols):
        """Branchless: limbs - p if limbs >= p else limbs (16-bit limbs in)."""
        borrow = None
        diff = []
        two16 = _u32(1 << SHIFT)
        for a, b in zip(limbs, p_cols):
            t = a + two16 - b if borrow is None else a + two16 - b - borrow
            diff.append(t & MASK)
            borrow = _u32(1) - (t >> SHIFT)
        ge = borrow == 0  # no borrow -> a >= p
        return [jnp.where(ge, d, a) for d, a in zip(diff, limbs)]

    # -------- vectorized (limb-axis) carry plumbing: Kogge-Stone, log depth --
    @staticmethod
    def _shift_up(x, d: int):
        """x[i] <- x[i-d] along the leading (limb) axis, zero-filled."""
        pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)[: x.shape[0]]

    @staticmethod
    def _prop(s):
        """Full carry propagation of u32 columns s (m, *batch), any u32 value.

        Returns (limbs (m,*batch) u32 < 2^16, carry_out (*batch,) u32).
        One pre-pass folds multi-bit carries (cols < 2^22 -> < 2^17), then a
        Kogge-Stone generate/propagate prefix resolves the remaining 0/1
        carries in log2(m) rounds of whole-array ops — no 16-deep scalar
        chains (those made XLA:CPU fusion clusters explode)."""
        m = s.shape[0]
        hi = s >> SHIFT  # < 2^6
        lo = s & MASK
        s2 = lo + Field._shift_up(hi, 1)  # < 2^16 + 2^6 < 2^17
        extra = hi[m - 1]  # carry out of the top column from the pre-pass
        g = s2 >> SHIFT  # generate: 0/1
        pr = ((s2 & MASK) == MASK).astype(jnp.uint32)
        d = 1
        while d < m:
            g = g | (pr & Field._shift_up(g, d))
            pr = pr & Field._shift_up(pr, d)
            d <<= 1
        cin = Field._shift_up(g, 1)
        limbs = (s2 + cin) & MASK
        carry_out = extra + g[m - 1]
        return limbs, carry_out

    def _ge_sub(self, x, c_limbs, r_minus_c_limbs):
        """x - C if x >= C else x, for 16-bit limb array x (m,*batch) and a
        host constant C given as limbs plus (2^(16m) - C) limbs.

        Computed as t = x + (R - C): carry out <=> x >= C; then select."""
        t = x + self.broadcast_const(r_minus_c_limbs, x)
        t_limbs, carry = self._prop(t)
        return jnp.where(carry > 0, t_limbs, x)

    def _prop_reduce(self, s, r_minus_c_limbs, carry_threshold: int):
        """One fused pass: propagate raw columns s (< 2^21) AND conditionally
        subtract a constant C (given as R - C limbs).

        Stacks the two candidates (s, s + (R-C)) on a new axis and runs a
        single Kogge-Stone propagation over both — half the XLA op count of
        two separate passes. Selects candidate 1 when its carry-out reaches
        `carry_threshold` (1 when s's value < R; 2 when s carries a known +R
        offset, as in sub())."""
        rc = self.broadcast_const(r_minus_c_limbs, s)
        cand = jnp.stack([s, s + rc], axis=1)  # (n, 2, *batch)
        limbs, carry = self._prop(cand)
        return jnp.where(carry[1] >= carry_threshold, limbs[:, 1], limbs[:, 0])

    # ------------------------------------------------------------------- add/sub
    def add(self, a, b):
        """a + b with a, b < 2p; result < 2p (lazy range)."""
        # value < 4p < R: candidate-1 carry of 1 means a+b >= 2p
        return self._prop_reduce(a + b, self._r_minus_2p, 1)

    def sub(self, a, b):
        """a - b with a, b < 2p; result < 2p (lazy range).

        Column arithmetic: a_i + (2p_i + 0xffff + [i=0]) - b_i sums to
        (a - b + 2p) + R; the known +R offset means the conditional-subtract
        candidate carries out twice when a - b + 2p >= 2p."""
        t = a + self.broadcast_const(self._sub_const, a) - b
        return self._prop_reduce(t, self._r_minus_2p, 2)

    def neg(self, a):
        return self.sub(self.broadcast_const(self._zero, a), a)

    def double(self, a):
        return self.add(a, a)

    def broadcast_const(self, c, like):
        """(n_limbs,) const -> broadcast to like's shape.

        Single broadcast_in_dim (no reshape): Mosaic (Pallas TPU) cannot
        lower 1-D->n-D reshapes of kernel inputs, but handles this."""
        return jax.lax.broadcast_in_dim(c, like.shape, (0,))

    # --------------------------------------------------------------- mont mul
    @staticmethod
    def _antidiag_sum(x, n: int):
        """Antidiagonal sums t[k] = sum_{i+j=k} x[i, j] for x (n, n, *batch)
        -> (2n-1, *batch), exact u32, via the skew-reshape trick:

        pad rows to width 2n and re-read the flat buffer with row stride
        2n-1; then x[i, j] lands at [i, i+j], so antidiagonal k is column k.
        Pure data movement + a 16-deep sum — no f32 conversion, no matmul;
        all layout-preserving on TPU (row-major merges only)."""
        batch = x.shape[2:]
        xp = jnp.pad(x, ((0, 0), (0, n)) + ((0, 0),) * len(batch))
        flat = xp.reshape((2 * n * n,) + batch)[: n * (2 * n - 1)]
        sk = flat.reshape((n, 2 * n - 1) + batch)
        # unrolled log-tree sum over axis 0 (Mosaic has no u32 reduce op)
        rows = [sk[i] for i in range(n)]
        while len(rows) > 1:
            half = len(rows) // 2
            rows = [rows[i] + rows[half + i] for i in range(half)] + rows[2 * half :]
        return rows[0]

    def _antidiag_dot(self, x, n: int, low_only: bool = False):
        """Antidiagonal sums of x (n, n, *batch), u32 values < 2^16, via an
        MXU matmul with the 0/1 selection matrix (exact: 0/1 side exact in
        bf16, f32 accumulation of <= n terms < 2^16 stays < 2^20)."""
        import math

        batch = x.shape[2:]
        flat = x.reshape(n * n, math.prod(batch) if batch else 1)
        xf = flat.astype(jnp.int32).astype(jnp.float32)
        sel = self._sel_low if low_only else self._sel_full
        out = jax.lax.dot_general(
            sel,
            xf,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        rows = n if low_only else 2 * n - 1
        return out.astype(jnp.int32).astype(jnp.uint32).reshape((rows,) + batch)

    def _limb_mul_cols(self, a, b, low_only: bool = False):
        """u32 columns of the limb product a*b, as a (2n, *batch) array
        (or (n, *batch) if low_only: the product mod R). Columns < 2^21.

        a, b: (n, *batch) 16-bit limbs. 16x16->32 outer products (exact in
        u32), then antidiagonal sums by one of two equivalent routes chosen
        at trace time (IN_PALLAS): the skew-reshape inside kernels, the 0/1
        selection-matrix f32 matmul under plain XLA (each ~5x faster than
        the other in its own regime on v5e)."""
        import math

        n = self.n
        outer = a[:, None] * b[None]  # (n, n, *batch) u32, exact
        batch = outer.shape[2:]
        if IN_PALLAS.get():
            lo = outer & MASK
            hi = outer >> SHIFT
            if ANTIDIAG_MXU.get():
                # offload the antidiagonal sums to the MXU: one (2n-1, n^2)
                # 0/1 matmul per half. Exact even at default precision —
                # the 0/1 side is exact in bf16 and the f32 accumulation of
                # <= n terms < 2^16 stays < 2^20 < 2^24. Frees ~35% of the
                # kernel's VPU ops (the log-tree antidiagonal adds).
                tlo = self._antidiag_dot(lo, n, low_only)
                thi = self._antidiag_dot(hi, n, low_only)
                if low_only:
                    # dot path already emitted only rows < n
                    return tlo + self._shift_up(thi, 1)[:n]
                tlo_full = jnp.concatenate(
                    [tlo, jnp.zeros_like(tlo[:1])], axis=0
                )
                thi_full = jnp.concatenate(
                    [jnp.zeros_like(thi[:1]), thi], axis=0
                )
                return tlo_full + thi_full
            tlo = self._antidiag_sum(lo, n)  # (2n-1, *batch) cols < 2^20
            thi = self._antidiag_sum(hi, n)
        else:
            # explicit sizes (not -1): batch may contain 0-length dims when
            # called on empty slices inside associative_scan's recursion
            flat = outer.reshape(n * n, math.prod(batch))
            lo = (flat & MASK).astype(jnp.int32).astype(jnp.float32)
            hi = (flat >> SHIFT).astype(jnp.int32).astype(jnp.float32)
            sel = self._sel_low if low_only else self._sel_full
            rows = n if low_only else 2 * n - 1
            tlo = jax.lax.dot(sel, lo, precision=jax.lax.Precision.HIGHEST)
            thi = jax.lax.dot(sel, hi, precision=jax.lax.Precision.HIGHEST)
            tlo = tlo.astype(jnp.int32).astype(jnp.uint32).reshape((rows,) + batch)
            thi = thi.astype(jnp.int32).astype(jnp.uint32).reshape((rows,) + batch)
        # columns: t[k] = tlo[k] + thi[k-1]
        if low_only:
            return tlo[:n] + self._shift_up(thi, 1)[:n]
        tlo_full = jnp.concatenate([tlo, jnp.zeros_like(tlo[:1])], axis=0)
        thi_full = jnp.concatenate([jnp.zeros_like(thi[:1]), thi], axis=0)
        return tlo_full + thi_full

    # ----------------------------------------------- MXU constant multiply
    def _const_mul_cols_mxu(self, a, key: str):
        """u32 columns of a * C for a HOST CONSTANT C, via two exact bf16
        MXU matmuls (band matrices built in _const_band_mats).

        a: (n, *batch) 16-bit limbs. Returns (n_out16, *batch) u32 columns
        < 2^30 (out8 < 2^21, odd column shifted by 8). Offloads Montgomery
        phases 2 and 3 — ~60% of the VPU work of a full-word mul — to the
        otherwise-idle MXU; phase 1 (data*data) stays on the VPU."""
        import math

        n = self.n
        M_ev, M_od = self._mxu_mats[key]
        batch = a.shape[1:]
        # 16-bit limbs -> interleaved 8-bit rows [x0_lo, x0_hi, x1_lo, ...]
        a8 = jnp.stack([a & jnp.uint32(0xFF), a >> jnp.uint32(8)], axis=1)
        a8 = a8.reshape((2 * n,) + batch)
        a8f = a8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        flat = a8f.reshape(2 * n, math.prod(batch) if batch else 1)
        dn = (((1,), (0,)), ((), ()))
        ev = jax.lax.dot_general(
            jnp.asarray(M_ev), flat, dn, preferred_element_type=jnp.float32
        )
        od = jax.lax.dot_general(
            jnp.asarray(M_od), flat, dn, preferred_element_type=jnp.float32
        )
        ev = ev.astype(jnp.int32).astype(jnp.uint32)
        od = od.astype(jnp.int32).astype(jnp.uint32)
        cols = ev + (od << jnp.uint32(8))
        return cols.reshape((M_ev.shape[0],) + batch)

    def _use_mxu(self) -> bool:
        return IN_PALLAS.get() or FORCE_MXU_CONST_MUL.get()

    # Auto-fuse threshold: above this many batch lanes the plain-XLA mul's
    # materialized intermediates (the (n,n,*batch) outer product and its f32
    # lo/hi copies — ~6 GB at batch 2^20 for 16 limbs) dominate; route the op
    # through the Pallas batch tiler instead (VMEM-resident, ~5x faster, and
    # peak memory is O(tile) not O(batch)).
    AUTO_FUSE_LANES = 1 << 15

    def _auto_fuse(self, name: str, impl):
        """Cached fuse() wrapper for a 2-ary limb op (TPU only)."""
        w = self._fused.get(name)
        if w is None:
            from .fuse import fuse

            w = fuse(impl, lanes=2048)
            self._fused[name] = w
        return w

    def _should_fuse(self, a) -> bool:
        import math

        if IN_PALLAS.get() or jax.default_backend() != "tpu":
            return False
        return math.prod(a.shape[1:]) >= self.AUTO_FUSE_LANES

    def mul(self, a, b):
        """Full-word Montgomery product a*b*R^-1 mod p; auto-tiled through a
        Pallas kernel for large batches (see AUTO_FUSE_LANES)."""
        a, b = jnp.broadcast_arrays(a, b)
        if self._should_fuse(a):
            return self._auto_fuse("mul", self._mul_impl)(a, b)
        return self._mul_impl(a, b)

    def _mul_impl(self, a, b):
        """Full-word Montgomery product a*b*R^-1 mod p.

        Inputs < 2p (lazy range); output < 2p. Sound since 4p < R:
        T = a*b < 4p^2 < R*p, so (T + m*p)/R < 2p."""
        n = self.n
        a, b = jnp.broadcast_arrays(a, b)
        t = self._limb_mul_cols(a, b)  # (2n, *batch) columns < 2^21
        # m = (T mod R) * P' mod R  (P' = -p^-1 mod R)
        t_lo_limbs, _ = self._prop(t[:n])  # mod R: drop the out-carry
        use_mxu = self._use_mxu()
        if use_mxu:
            m_cols = self._const_mul_cols_mxu(t_lo_limbs, "pprime_low")
        else:
            ppr = self.broadcast_const(self._pprime_limbs, a)
            m_cols = self._limb_mul_cols(t_lo_limbs, ppr, low_only=True)
        m_limbs, _ = self._prop(m_cols)  # mod R
        # S = T + m*p  (columns < 2^31); S mod R == 0; result = S / R
        if use_mxu:
            mp = self._const_mul_cols_mxu(m_limbs, "p_full")
        else:
            p_arr = self.broadcast_const(self._p_limbs_arr, a)
            mp = self._limb_mul_cols(m_limbs, p_arr)
        s = t + mp
        _, carry = self._prop(s[:n])  # low half is all zeros mod R
        # (concatenate, not .at[0].add: scatter has no Pallas TPU lowering)
        hi = jnp.concatenate([s[n : n + 1] + carry[None], s[n + 1 :]], axis=0)
        limbs, _ = self._prop(hi)  # result < 2p < R: no out-carry
        return limbs

    def square(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.mul(a, self.broadcast_const(self._r2, a))

    def from_mont(self, a):
        """REDC(a): a*R^-1 mod p (auto-tiled like mul for large batches)."""
        if self._should_fuse(a):
            return self._auto_fuse("from_mont", self._from_mont_impl)(a)
        return self._from_mont_impl(a)

    def _from_mont_impl(self, a):
        """REDC(a): a*R^-1 mod p. Input < 2p; output <= p (p only when a = p
        represents zero — harmless: decode reduces mod p, and as an MSM
        scalar over fr, r*P is the identity anyway)."""
        n = self.n
        if self._use_mxu():
            m_cols = self._const_mul_cols_mxu(a, "pprime_low")
            m_limbs, _ = self._prop(m_cols)
            mp = self._const_mul_cols_mxu(m_limbs, "p_full")
        else:
            ppr = self.broadcast_const(self._pprime_limbs, a)
            m_cols = self._limb_mul_cols(a, ppr, low_only=True)
            m_limbs, _ = self._prop(m_cols)
            p_arr = self.broadcast_const(self._p_limbs_arr, a)
            mp = self._limb_mul_cols(m_limbs, p_arr)
        s = jnp.concatenate([mp[:n] + a, mp[n:]], axis=0)
        _, carry = self._prop(s[:n])
        hi = jnp.concatenate([s[n : n + 1] + carry[None], s[n + 1 :]], axis=0)
        limbs, _ = self._prop(hi)
        return limbs

    # ------------------------------------------------------------- comparisons
    def canon(self, a):
        """Map the lazy range [0, 2p) to canonical [0, p)."""
        return self._ge_sub(a, self._p_limbs_arr, self._r_minus_p)

    def is_zero(self, a):
        """a == 0 mod p for a in [0, 2p]: representation is 0 or p."""
        p_arr = self.broadcast_const(self._p_limbs_arr, a)
        return jnp.all(a == 0, axis=0) | jnp.all(a == p_arr, axis=0)

    def eq(self, a, b):
        return self.is_zero(self.sub(a, b))

    @staticmethod
    def select(cond, a, b):
        """cond: (*batch,) bool; a,b: (n_limbs, *batch)."""
        return jnp.where(cond, a, b)

    # ----------------------------------------------------------- powering / inv
    def pow_static(self, a, e: int):
        """a^e for a host-known integer exponent, via lax.scan over bits."""
        if e == 0:
            return self.broadcast_const(self._one_mont, a)
        bits = [(e >> i) & 1 for i in range(e.bit_length())]
        bits_arr = jnp.asarray(np.array(bits[::-1], dtype=np.uint32))  # MSB first

        one = self.broadcast_const(self._one_mont, a)

        def body(acc, bit):
            acc = self.square(acc)
            mul_acc = self.mul(acc, a)
            acc = jnp.where(bit == 1, mul_acc, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, one, bits_arr)
        return acc

    def inv(self, a):
        """Batched inversion via Fermat: a^(p-2). inv(0) = 0."""
        return self.pow_static(a, self.spec.modulus - 2)

    # -------------------------------------------------- wide / lazy accumulation
    def reduce_columns(self, cols, bound: int):
        """Reduce a column-represented value (u32 columns, total value < bound)
        to a canonical element. `bound` is a host-side upper bound (inclusive)."""
        n = self.n
        limbs, carry = self._carry_prop(cols)
        limbs.append(carry)
        # represented exactly by len(limbs) 16-bit limbs now
        nlimb_needed = (bound.bit_length() + SHIFT - 1) // SHIFT
        limbs = limbs[: max(n, nlimb_needed)]

        # fold limbs >= n down using 2^(16k) mod p while this makes progress.
        # per-limb bound: limb k <= min(MASK, bound >> 16k); the fold shrinks
        # the value by ~2.3 bits/round (p/2^256) until the low n limbs dominate.
        for _ in range(64):  # static safety cap
            L = len(limbs)
            if L <= n:
                break
            new_bound = (1 << (SHIFT * n)) - 1
            acc = list(limbs[:n])
            extra = None
            for k in range(n, L):
                lb_k = min(LIMB_MASK, bound >> (SHIFT * k))
                new_bound += lb_k * self._fold[k]
                dk = int_to_limbs(self._fold[k], n)
                hk = limbs[k]
                for j in range(n):
                    pm = hk * _u32(dk[j])
                    acc[j] = acc[j] + (pm & MASK)
                    hi = pm >> SHIFT
                    if j + 1 < n:
                        acc[j + 1] = acc[j + 1] + hi
                    else:
                        extra = hi if extra is None else extra + hi
            if new_bound >= bound:
                break  # fixed point: finish with the subtract chain below
            cols2 = acc + ([extra] if extra is not None else [])
            limbs, carry = self._carry_prop(cols2)
            limbs.append(carry)
            nlimb_needed = (new_bound.bit_length() + SHIFT - 1) // SHIFT
            limbs = limbs[: max(n, nlimb_needed)]
            bound = new_bound
        # conditional-subtract chain of p<<j over the remaining limbs:
        # value < bound <= 2*(p<<jmax) with jmax = bound bits - p bits; each
        # step halves the bound until canonical (< p).
        p = self.spec.modulus
        L = len(limbs)
        jmax = max(0, bound.bit_length() - p.bit_length())
        assert p << jmax < (1 << (SHIFT * L)) or jmax == 0, "reduce_columns: bound too wide"
        for j in range(jmax, -1, -1):
            m_cols = [_u32(l) for l in int_to_limbs(p << j, L)]
            limbs = self._sub_p_if_ge(limbs, m_cols)
        limbs = limbs[:n]
        while len(limbs) < n:
            limbs.append(jnp.zeros_like(limbs[0]))
        return self._stack(limbs)

    def sum(self, a, axis: int = 1):
        """Sum of elements (lazy range < 2p) along batch axis `axis`, mod p."""
        assert axis >= 1
        k = a.shape[axis]
        assert k <= 1 << 16, "sum too long for lazy accumulation"
        cols_arr = jnp.sum(a, axis=axis)
        bound = k * (2 * self.spec.modulus - 1)
        return self.reduce_columns(self._cols(cols_arr), bound)

    def segment_sum(self, values, segment_ids, num_segments: int, max_segment: int = 1 << 16):
        """Segmented modular sum: values (n_limbs, N) in [0, 2p), ids (N,).

        max_segment bounds the number of elements per segment (host-side),
        needed for the lazy-accumulation overflow analysis."""
        assert max_segment <= 1 << 16
        cols = jnp.zeros((self.n, num_segments), dtype=jnp.uint32).at[:, segment_ids].add(values)
        bound = max_segment * (2 * self.spec.modulus - 1)
        return self.reduce_columns(self._cols(cols), bound)

    # ---------------------------------------------------------------- helpers
    def mul_const(self, a, c: int):
        """Multiply by a host constant (given in normal form, converted here)."""
        cm = self.const(c, mont=True)
        return self.mul(a, self.broadcast_const(cm, a))


@functools.lru_cache(maxsize=None)
def get_field(spec: FieldSpec) -> Field:
    return Field(spec)
