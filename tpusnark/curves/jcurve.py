"""Batched elliptic-curve arithmetic in JAX (G1 over Fp, G2 over Fp2).

Replaces gnark-crypto's Jacobian/affine point assembly (SURVEY.md §2.5,
MultiExp/BatchScalarMultiplication call sites at
/root/reference/backend/groth16/bn254/prove.go:201-290, setup.go:251).

TPU-native design choice: Renes-Costello-Batina (2015) *complete* projective
addition formulas for a=0 short-Weierstrass curves. They are branch-free —
one formula covers add, double, inverse and identity inputs — so batched
point addition needs no per-lane case analysis (the reference's Jacobian code
branches on equality/infinity per point; a TPU lane divergence disaster).
Identity = (0 : 1 : 0).

Coordinates are field elements in the Field/Fp2 limb representation
((n_limbs, *batch) uint32, Montgomery form). Points are (X, Y, Z) tuples.
Affine points are (X, Y, inf_mask) with inf_mask: bool (*batch,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.jfield import Field


class FpArith:
    """Adapter giving CurveOps a uniform field interface over Fp."""

    def __init__(self, field: Field, b: int):
        self.f = field
        self.b = b
        self.b3 = 3 * b

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def mul(self, a, b):
        return self.f.mul(a, b)

    def neg(self, a):
        return self.f.neg(a)

    # ---- stacked ops: k independent field ops as ONE batched op. The limb
    # code is shape-polymorphic, so stacking on a new axis right after the
    # limb axis turns k muls into one mul with a k-times-wider batch: ~k
    # times fewer XLA ops in the graph (compile time) and k-times-larger
    # kernels at runtime (the MSM scan steps are launch-latency-bound).
    def stack(self, xs):
        return jnp.stack(jnp.broadcast_arrays(*xs), axis=1)

    def unstack(self, x, k: int):
        return [x[:, i] for i in range(k)]

    def mul_many(self, pairs):
        A = self.stack([a for a, _ in pairs])
        B = self.stack([b for _, b in pairs])
        return self.unstack(self.f.mul(A, B), len(pairs))

    def add_many(self, pairs):
        A = self.stack([a for a, _ in pairs])
        B = self.stack([b for _, b in pairs])
        return self.unstack(self.f.add(A, B), len(pairs))

    def sub_many(self, pairs):
        A = self.stack([a for a, _ in pairs])
        B = self.stack([b for _, b in pairs])
        return self.unstack(self.f.sub(A, B), len(pairs))

    def mul_b3(self, x):
        # 3b = 9 for bn254 G1: 9x = 8x + x (3 doublings + add beats a mont mul)
        if self.b3 == 9:
            x2 = self.f.add(x, x)
            x4 = self.f.add(x2, x2)
            x8 = self.f.add(x4, x4)
            return self.f.add(x8, x)
        return self.f.mul_const(x, self.b3)

    def mul_b3_many(self, xs):
        return self.unstack(self.mul_b3(self.stack(xs)), len(xs))

    def select(self, cond, a, b):
        return jnp.where(cond, a, b)

    def zero_like(self, x):
        return jnp.zeros_like(x)

    def one_like(self, x):
        return jnp.broadcast_to(self.f.one.reshape((self.f.n,) + (1,) * (x.ndim - 1)), x.shape)

    def is_zero(self, x):
        return self.f.is_zero(x)


class Fp2Arith:
    """Fp2 = Fp[u]/(u^2 + q); elements are (c0, c1) tuples of Fp limb arrays.

    q = 1 for BN254/BLS12-381 (u^2 = -1), q = 5 for BLS12-377 (u^2 = -5);
    kept small so q*t1 is an add chain, never a Montgomery mul."""

    def __init__(self, field: Field, b3_fp2: tuple[int, int], q: int = 1):
        self.f = field
        self._b3 = b3_fp2  # (c0, c1) python ints, normal form
        assert q in (1, 2, 5), "small nonresidue expected"
        self.q = q

    def _mul_q(self, x):
        """q * x via lazy adds (q is 1, 2 or 5)."""
        f = self.f
        if self.q == 1:
            return x
        x2 = f.add(x, x)
        if self.q == 2:
            return x2
        x4 = f.add(x2, x2)
        return f.add(x4, x)

    def add(self, a, b):
        return (self.f.add(a[0], b[0]), self.f.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1]))

    def neg(self, a):
        return (self.f.neg(a[0]), self.f.neg(a[1]))

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    # ---- stacked ops over Fp2 (see FpArith.mul_many): k fp2 Karatsuba muls
    # become ONE fp mul with a 3k-wide stack axis.
    def stack(self, xs):
        return (
            jnp.stack(jnp.broadcast_arrays(*[x[0] for x in xs]), axis=1),
            jnp.stack(jnp.broadcast_arrays(*[x[1] for x in xs]), axis=1),
        )

    def unstack(self, x, k: int):
        return [(x[0][:, i], x[1][:, i]) for i in range(k)]

    def mul_many(self, pairs):
        f = self.f
        k = len(pairs)
        a0, a1 = self.stack([a for a, _ in pairs])
        b0, b1 = self.stack([b for _, b in pairs])
        asum = f.add(a0, a1)
        bsum = f.add(b0, b1)
        A = jnp.concatenate([a0, a1, asum], axis=1)
        B = jnp.concatenate([b0, b1, bsum], axis=1)
        T = f.mul(A, B)  # (L, 3k, *batch)
        t0, t1, t2 = T[:, :k], T[:, k : 2 * k], T[:, 2 * k :]
        c0 = f.sub(t0, self._mul_q(t1))
        c1 = f.sub(t2, f.add(t0, t1))
        return [(c0[:, i], c1[:, i]) for i in range(k)]

    def add_many(self, pairs):
        f = self.f
        a0, a1 = self.stack([a for a, _ in pairs])
        b0, b1 = self.stack([b for _, b in pairs])
        return self.unstack((f.add(a0, b0), f.add(a1, b1)), len(pairs))

    def sub_many(self, pairs):
        f = self.f
        a0, a1 = self.stack([a for a, _ in pairs])
        b0, b1 = self.stack([b for _, b in pairs])
        return self.unstack((f.sub(a0, b0), f.sub(a1, b1)), len(pairs))

    def mul_b3(self, x):
        f = self.f
        c0 = f.broadcast_const(f.const(self._b3[0], mont=True), x[0])
        c1 = f.broadcast_const(f.const(self._b3[1], mont=True), x[1])
        return self.mul(x, (c0, c1))

    def mul_b3_many(self, xs):
        f = self.f
        b3 = (
            f.const(self._b3[0], mont=True),
            f.const(self._b3[1], mont=True),
        )
        consts = [
            (f.broadcast_const(b3[0], x[0]), f.broadcast_const(b3[1], x[1]))
            for x in xs
        ]
        return self.mul_many(list(zip(xs, consts)))

    def select(self, cond, a, b):
        return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))

    def zero_like(self, x):
        return (jnp.zeros_like(x[0]), jnp.zeros_like(x[1]))

    def one_like(self, x):
        f = self.f
        one = jnp.broadcast_to(f.one.reshape((f.n,) + (1,) * (x[0].ndim - 1)), x[0].shape)
        return (one, jnp.zeros_like(x[1]))

    def is_zero(self, x):
        return self.f.is_zero(x[0]) & self.f.is_zero(x[1])


class CurveOps:
    """Complete projective group law over an arithmetic adapter."""

    def __init__(self, fa):
        self.fa = fa

    # ---- identity -----------------------------------------------------------
    def identity_like(self, coord):
        fa = self.fa
        return (fa.zero_like(coord), fa.one_like(coord), fa.zero_like(coord))

    def is_identity(self, p):
        return self.fa.is_zero(p[2])

    # ---- complete addition (RCB15 algorithm 7, a=0) -------------------------
    # Structured as two STACKED mul rounds (6 muls each) + stacked add/sub
    # chains: ~4x fewer XLA ops than 12 separate muls, and each mul kernel is
    # 6x wider (the MSM scan is kernel-launch-latency-bound).
    def add(self, p, q):
        fa = self.fa
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        s1 = fa.add_many([(X1, Y1), (Y1, Z1), (X1, Z1)])
        s2 = fa.add_many([(X2, Y2), (Y2, Z2), (X2, Z2)])
        t0, t1, t2, m3, m4, m5 = fa.mul_many(
            [(X1, X2), (Y1, Y2), (Z1, Z2), (s1[0], s2[0]), (s1[1], s2[1]), (s1[2], s2[2])]
        )
        t01, t12, t02 = fa.add_many([(t0, t1), (t1, t2), (t0, t2)])
        t3, t4, y3p = fa.sub_many([(m3, t01), (m4, t12), (m5, t02)])
        x3 = fa.add(t0, t0)
        t0n = fa.add(x3, t0)  # 3*t0
        t2b, y3b = fa.mul_b3_many([t2, y3p])
        z3 = fa.add(t1, t2b)
        t1n = fa.sub(t1, t2b)
        r = fa.mul_many(
            [(t4, y3b), (t3, t1n), (y3b, t0n), (t1n, z3), (t0n, t3), (z3, t4)]
        )
        x3 = fa.sub(r[1], r[0])
        y3, z3 = fa.add_many([(r[3], r[2]), (r[5], r[4])])
        return (x3, y3, z3)

    # ---- complete mixed addition (RCB15 algorithm 8, a=0, Z2=1) -------------
    def add_mixed(self, p, q_affine):
        """p + (x2, y2[, inf]); if inf mask given, those lanes return p."""
        fa = self.fa
        X1, Y1, Z1 = p
        if len(q_affine) == 3:
            X2, Y2, inf = q_affine
        else:
            (X2, Y2), inf = q_affine, None
        sx1, sx2 = fa.add_many([(X1, Y1), (X2, Y2)])
        t0, t1, m3, mt4, mt5 = fa.mul_many(
            [(X1, X2), (Y1, Y2), (sx1, sx2), (X2, Z1), (Y2, Z1)]
        )
        t01 = fa.add(t0, t1)
        t3 = fa.sub(m3, t01)
        t4, t5 = fa.add_many([(mt4, X1), (mt5, Y1)])
        z3b, y3b = fa.mul_b3_many([Z1, t4])
        x3 = fa.add(t0, t0)
        t0n = fa.add(x3, t0)  # 3*t0
        z3 = fa.add(t1, z3b)
        t1n = fa.sub(t1, z3b)
        r = fa.mul_many(
            [(t5, y3b), (t3, t1n), (y3b, t0n), (t1n, z3), (t0n, t3), (z3, t5)]
        )
        x3 = fa.sub(r[1], r[0])
        y3, z3 = fa.add_many([(r[3], r[2]), (r[5], r[4])])
        out = (x3, y3, z3)
        if inf is not None:
            out = tuple(fa.select(inf, a, b) for a, b in zip(p, out))
        return out

    def double(self, p):
        return self.add(p, p)

    def neg(self, p):
        return (p[0], self.fa.neg(p[1]), p[2])

    def select(self, cond, p, q):
        return tuple(self.fa.select(cond, a, b) for a, b in zip(p, q))

    # ---- conversions --------------------------------------------------------
    def from_affine(self, q_affine):
        """(x, y, inf) -> projective; inf lanes -> (0,1,0)."""
        fa = self.fa
        if len(q_affine) == 3:
            X, Y, inf = q_affine
        else:
            (X, Y), inf = q_affine, None
        Z = fa.one_like(X)
        p = (X, Y, Z)
        if inf is not None:
            p = self.select(inf, self.identity_like(X), p)
        return p


class FusedCurveOps(CurveOps):
    """CurveOps with the heavy group-law ops compiled as single Pallas
    kernels (VMEM-resident; ~5x per-add over the plain XLA lowering on
    v5e). Selection/identity/conversion helpers stay plain — they are
    cheap and often fold into neighboring ops. No-op off TPU.

    Batch dims are flattened to ONE trailing axis around the kernel (free
    row-major reshapes) so the fuse tiler always sees (L, N)/(N,) leaves
    and can honor its VMEM lane budget regardless of caller shapes."""

    def __init__(self, fa):
        super().__init__(fa)
        from ..fields.fuse import fuse

        self._f_add = fuse(super().add)
        self._f_add_mixed = fuse(super().add_mixed)

    @staticmethod
    def _flatten(args):
        """Point pytrees -> batch-flattened; leaves are (L, *batch) coords
        or (*batch,) masks. Returns (flat_args, batch_shape)."""
        import math

        leaves = jax.tree_util.tree_leaves(args)
        batch = leaves[0].shape[1:]  # first leaf is always a coord
        nb = math.prod(batch)

        def flat(a):
            lead = a.shape[: a.ndim - len(batch)]
            assert a.shape[a.ndim - len(batch) :] == batch
            return a.reshape(lead + (nb,))

        return jax.tree_util.tree_map(flat, args), batch

    @staticmethod
    def _unflatten(out, batch):
        return jax.tree_util.tree_map(
            lambda a: a.reshape(a.shape[:-1] + batch), out
        )

    def add(self, p, q):
        args, batch = self._flatten((p, q))
        return self._unflatten(self._f_add(*args), batch)

    def add_mixed(self, p, q_affine):
        args, batch = self._flatten((p, q_affine))
        return self._unflatten(self._f_add_mixed(*args), batch)

    def double(self, p):
        return self.add(p, p)


def g1_ops(field_fp: Field, b: int = 3) -> CurveOps:
    return CurveOps(FpArith(field_fp, b=b))


def g1_ops_fused(field_fp: Field, b: int = 3) -> CurveOps:
    return FusedCurveOps(FpArith(field_fp, b=b))


def _g2_b3(field_fp: Field) -> tuple[int, int]:
    # BN254 default: b' = 3/(9+u); 3b' precomputed as Fp2 constant
    from .ref import XI, Fp2 as RefFp2

    b2 = RefFp2(3, 0) * XI.inv()
    b3 = b2 * 3
    return (b3.c0, b3.c1)


def g2_ops(
    field_fp: Field, b3: tuple[int, int] | None = None, q: int = 1
) -> CurveOps:
    return CurveOps(Fp2Arith(field_fp, b3 or _g2_b3(field_fp), q=q))


def g2_ops_fused(
    field_fp: Field, b3: tuple[int, int] | None = None, q: int = 1
) -> CurveOps:
    return FusedCurveOps(Fp2Arith(field_fp, b3 or _g2_b3(field_fp), q=q))
