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


def _small_mul(f: Field, x, k: int):
    """k * x for a small host int k via lazy double-and-add (k <= ~16:
    cheaper than a Montgomery mul, and keeps constants out of the graph)."""
    assert k >= 0
    if k == 0:
        return jnp.zeros_like(x)
    acc = None
    addend = x
    kk = k
    while kk:
        if kk & 1:
            acc = addend if acc is None else f.add(acc, addend)
        kk >>= 1
        if kk:
            addend = f.add(addend, addend)
    return acc


class Fp2Arith:
    """Fp2 = Fp[u]/(u^2 + q); elements are (c0, c1) tuples of Fp limb arrays.

    q = 1 for BN254/BLS12-381 (u^2 = -1), q = 5 for BLS12-377 (u^2 = -5);
    kept small so q*t1 is an add chain, never a Montgomery mul."""

    def __init__(self, field: Field, b3_fp2: tuple[int, int], q: int = 1):
        self.f = field
        self._b3 = b3_fp2  # (c0, c1) python ints, normal form
        assert 1 <= q <= 16, "small nonresidue expected"
        self.q = q

    def _mul_q(self, x):
        """q * x via a lazy double-and-add chain (q small, e.g. 1/2/5/13)."""
        return _small_mul(self.f, x, self.q)

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


class Fp4Arith:
    """Fp4 = Fp2[v]/(v^2 - Z2); elements are (c0, c1) tuples of Fp2 elements
    (each itself a (a, b) tuple of Fp limb arrays).

    The G2 coordinate field of the BLS24 curves (reference
    backend/groth16/bls24-315/prove.go MSMs run over gnark-crypto's
    e2+e4 towers). u^2 = a2 (a2 a small negative int, e.g. -13 for
    BLS24-315); Z2 = (z0, z1) a small Fp2 element (e.g. u, or 1+u).
    Multiplication is Karatsuba over Fp2.mul_many, so one Fp4 mul is three
    Fp2 muls is nine stacked Fp muls — all fused into wide kernels."""

    def __init__(
        self,
        field: Field,
        b3_fp4: tuple,
        a2: int,
        z2: tuple[int, int],
    ):
        # Fp2Arith implements u^2 = -q, so q = -a2 (a2 < 0 for our curves)
        assert a2 < 0, "u^2 = a2 with a2 < 0 expected"
        self.f2 = Fp2Arith(field, (0, 0), q=-a2)
        self.f = field
        self.z2 = z2
        # 3*b' of the twist as ((c00,c01),(c10,c11)) python ints, normal form
        self._b3 = b3_fp4

    def _mul_z2(self, x):
        """x * Z2 over Fp2 for the small constant Z2 = z0 + z1 u."""
        f, (z0, z1) = self.f, self.z2
        c0, c1 = x
        q = self.f2.q  # u^2 = -q
        # (c0 + c1 u)(z0 + z1 u) = (z0 c0 - q z1 c1) + (z0 c1 + z1 c0) u
        r0s = []
        r1s = []
        if z0:
            r0s.append(_small_mul(f, c0, z0))
            r1s.append(_small_mul(f, c1, z0))
        if z1:
            r0s.append(f.neg(_small_mul(f, c1, q * z1)))
            r1s.append(_small_mul(f, c0, z1))
        r0 = r0s[0] if len(r0s) == 1 else f.add(*r0s)
        r1 = r1s[0] if len(r1s) == 1 else f.add(*r1s)
        return (r0, r1)

    def add(self, a, b):
        return (self.f2.add(a[0], b[0]), self.f2.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f2.sub(a[0], b[0]), self.f2.sub(a[1], b[1]))

    def neg(self, a):
        return (self.f2.neg(a[0]), self.f2.neg(a[1]))

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def mul_many(self, pairs):
        """Karatsuba: k Fp4 muls -> 3k Fp2 muls in one Fp2.mul_many call."""
        f2 = self.f2
        k = len(pairs)
        jobs = []
        for a, b in pairs:
            a0, a1 = a
            b0, b1 = b
            jobs.append((a0, b0))
            jobs.append((a1, b1))
            jobs.append((f2.add(a0, a1), f2.add(b0, b1)))
        T = f2.mul_many(jobs)
        out = []
        for i in range(k):
            t0, t1, t2 = T[3 * i], T[3 * i + 1], T[3 * i + 2]
            c0 = f2.add(t0, self._mul_z2(t1))
            c1 = f2.sub(t2, f2.add(t0, t1))
            out.append((c0, c1))
        return out

    def add_many(self, pairs):
        return [self.add(a, b) for a, b in pairs]

    def sub_many(self, pairs):
        return [self.sub(a, b) for a, b in pairs]

    def mul_b3(self, x):
        return self.mul_b3_many([x])[0]

    def mul_b3_many(self, xs):
        f = self.f
        b3 = tuple(
            tuple(f.const(c, mont=True) for c in pair) for pair in self._b3
        )
        consts = [
            tuple(
                tuple(f.broadcast_const(c, x[0][0]) for c in pair)
                for pair in b3
            )
            for x in xs
        ]
        return self.mul_many(list(zip(xs, consts)))

    def select(self, cond, a, b):
        f2 = self.f2
        return (f2.select(cond, a[0], b[0]), f2.select(cond, a[1], b[1]))

    def zero_like(self, x):
        f2 = self.f2
        return (f2.zero_like(x[0]), f2.zero_like(x[1]))

    def one_like(self, x):
        f2 = self.f2
        return (f2.one_like(x[0]), f2.zero_like(x[1]))

    def is_zero(self, x):
        return self.f2.is_zero(x[0]) & self.f2.is_zero(x[1])


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


def g2_ops_fp4(
    field_fp: Field, b3_fp4: tuple, a2: int, z2: tuple[int, int]
) -> CurveOps:
    """BLS24 G2 ops over Fp4 (see Fp4Arith)."""
    return CurveOps(Fp4Arith(field_fp, b3_fp4, a2, z2))


def g2_ops_fp4_fused(
    field_fp: Field, b3_fp4: tuple, a2: int, z2: tuple[int, int]
) -> CurveOps:
    return FusedCurveOps(Fp4Arith(field_fp, b3_fp4, a2, z2))
