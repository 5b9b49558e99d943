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

    def mul_b3(self, x):
        # 3b = 9 for bn254 G1: 9x = 8x + x (3 doublings + add beats a mont mul)
        if self.b3 == 9:
            x2 = self.f.add(x, x)
            x4 = self.f.add(x2, x2)
            x8 = self.f.add(x4, x4)
            return self.f.add(x8, x)
        return self.f.mul_const(x, self.b3)

    def select(self, cond, a, b):
        return jnp.where(cond, a, b)

    def zero_like(self, x):
        return jnp.zeros_like(x)

    def one_like(self, x):
        return jnp.broadcast_to(self.f.one.reshape((self.f.n,) + (1,) * (x.ndim - 1)), x.shape)

    def is_zero(self, x):
        return self.f.is_zero(x)


class Fp2Arith:
    """Fp2 = Fp[u]/(u^2+1); elements are (c0, c1) tuples of Fp limb arrays."""

    def __init__(self, field: Field, b3_fp2: tuple[int, int]):
        self.f = field
        self._b3 = b3_fp2  # (c0, c1) python ints, normal form

    def add(self, a, b):
        return (self.f.add(a[0], b[0]), self.f.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1]))

    def neg(self, a):
        return (self.f.neg(a[0]), self.f.neg(a[1]))

    def mul(self, a, b):
        # Karatsuba: 3 Fp muls
        f = self.f
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        return (f.sub(t0, t1), f.sub(t2, f.add(t0, t1)))

    def mul_b3(self, x):
        f = self.f
        c0 = f.broadcast_const(f.const(self._b3[0], mont=True), x[0])
        c1 = f.broadcast_const(f.const(self._b3[1], mont=True), x[1])
        return self.mul(x, (c0, c1))

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
    def add(self, p, q):
        fa = self.fa
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        t0 = fa.mul(X1, X2)
        t1 = fa.mul(Y1, Y2)
        t2 = fa.mul(Z1, Z2)
        t3 = fa.mul(fa.add(X1, Y1), fa.add(X2, Y2))
        t3 = fa.sub(t3, fa.add(t0, t1))
        t4 = fa.mul(fa.add(Y1, Z1), fa.add(Y2, Z2))
        t4 = fa.sub(t4, fa.add(t1, t2))
        x3 = fa.mul(fa.add(X1, Z1), fa.add(X2, Z2))
        y3 = fa.sub(x3, fa.add(t0, t2))
        x3 = fa.add(t0, t0)
        t0 = fa.add(x3, t0)
        t2 = fa.mul_b3(t2)
        z3 = fa.add(t1, t2)
        t1 = fa.sub(t1, t2)
        y3 = fa.mul_b3(y3)
        x3 = fa.mul(t4, y3)
        t2 = fa.mul(t3, t1)
        x3 = fa.sub(t2, x3)
        y3 = fa.mul(y3, t0)
        t1 = fa.mul(t1, z3)
        y3 = fa.add(t1, y3)
        t0 = fa.mul(t0, t3)
        z3 = fa.mul(z3, t4)
        z3 = fa.add(z3, t0)
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
        t0 = fa.mul(X1, X2)
        t1 = fa.mul(Y1, Y2)
        t3 = fa.mul(fa.add(X1, Y1), fa.add(X2, Y2))
        t3 = fa.sub(t3, fa.add(t0, t1))
        t4 = fa.add(fa.mul(X2, Z1), X1)
        t5 = fa.add(fa.mul(Y2, Z1), Y1)
        z3 = fa.mul_b3(Z1)
        x3 = fa.add(t0, t0)
        t0 = fa.add(x3, t0)
        z3_ = z3
        z3 = fa.add(t1, z3_)
        t1 = fa.sub(t1, z3_)
        y3 = fa.mul_b3(t4)
        x3 = fa.mul(t5, y3)
        t2 = fa.mul(t3, t1)
        x3 = fa.sub(t2, x3)
        y3 = fa.mul(y3, t0)
        t1 = fa.mul(t1, z3)
        y3 = fa.add(t1, y3)
        t0 = fa.mul(t0, t3)
        z3 = fa.mul(z3, t5)
        z3 = fa.add(z3, t0)
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


def g1_ops(field_fp: Field) -> CurveOps:
    return CurveOps(FpArith(field_fp, b=3))


def g2_ops(field_fp: Field) -> CurveOps:
    # b' = 3/(9+u); 3b' precomputed as Fp2 constant
    from .ref import XI, Fp2 as RefFp2

    b2 = RefFp2(3, 0) * XI.inv()
    b3 = b2 * 3
    return CurveOps(Fp2Arith(field_fp, (b3.c0, b3.c1)))
