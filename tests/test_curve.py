"""Batched JAX curve ops vs the pure-Python reference (G1 and G2)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from tpusnark.curves import ref
from tpusnark.curves.jcurve import g1_ops, g2_ops
from tpusnark.curves.ref import G1, G2, Fp2, P, R
from tpusnark.fields.jfield import Field
from tpusnark.fields.spec import BN254_FP

rng = random.Random(7)
fp = Field(BN254_FP)


def enc_g1(points):
    """affine python points -> (X, Y, inf) limb arrays."""
    xs = [p[0] if p else 0 for p in points]
    ys = [p[1] if p else 1 for p in points]
    inf = np.array([p is None for p in points])
    return (fp.array(xs), fp.array(ys), jnp.asarray(inf))


def dec_g1_proj(pt):
    """(X,Y,Z) limb arrays -> list of affine python points."""
    X = fp.to_ints(pt[0])
    Y = fp.to_ints(pt[1])
    Z = fp.to_ints(pt[2])
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, P)
            out.append((x * zi % P, y * zi % P))
    return out


def enc_g2(points):
    x0 = [p[0].c0 if p else 0 for p in points]
    x1 = [p[0].c1 if p else 0 for p in points]
    y0 = [p[1].c0 if p else 1 for p in points]
    y1 = [p[1].c1 if p else 0 for p in points]
    inf = np.array([p is None for p in points])
    return ((fp.array(x0), fp.array(x1)), (fp.array(y0), fp.array(y1)), jnp.asarray(inf))


def dec_g2_proj(pt):
    X0, X1 = fp.to_ints(pt[0][0]), fp.to_ints(pt[0][1])
    Y0, Y1 = fp.to_ints(pt[1][0]), fp.to_ints(pt[1][1])
    Z0, Z1 = fp.to_ints(pt[2][0]), fp.to_ints(pt[2][1])
    out = []
    for i in range(len(X0)):
        z = Fp2(Z0[i], Z1[i])
        if z.is_zero():
            out.append(None)
        else:
            zi = z.inv()
            out.append((Fp2(X0[i], X1[i]) * zi, Fp2(Y0[i], Y1[i]) * zi))
    return out


def rand_g1(k):
    g = G1.generator()
    return [G1.mul(g, rng.randrange(1, R)) for _ in range(k)]


def test_g1_add_mixed_and_full():
    ops = g1_ops(fp)
    n = 16
    pa, pb = rand_g1(n), rand_g1(n)
    A = ops.from_affine(enc_g1(pa))
    B = enc_g1(pb)
    got = dec_g1_proj(ops.add_mixed(A, B))
    want = [G1.add(a, b) for a, b in zip(pa, pb)]
    assert got == want
    # full projective add
    Bp = ops.from_affine(B)
    got2 = dec_g1_proj(ops.add(A, Bp))
    assert got2 == want


def test_g1_complete_edge_cases():
    ops = g1_ops(fp)
    g = G1.generator()
    q = G1.mul(g, 77)
    # cases: P+P (double), P+(-P) (infinity), P+0, 0+P, 0+0
    pa = [q, q, q, None, None]
    pb = [q, G1.neg(q), None, q, None]
    A = ops.from_affine(enc_g1(pa))
    B = ops.from_affine(enc_g1(pb))
    got = dec_g1_proj(ops.add(A, B))
    want = [G1.add(a, b) for a, b in zip(pa, pb)]
    assert got == want
    # mixed with infinity mask on the affine side
    got_m = dec_g1_proj(ops.add_mixed(A, enc_g1(pb)))
    assert got_m == want
    # double()
    got_d = dec_g1_proj(ops.double(A))
    assert got_d == [G1.double(x) for x in pa]


def test_g2_add():
    ops = g2_ops(fp)
    g = G2.generator()
    pa = [G2.mul(g, rng.randrange(1, R)) for _ in range(4)] + [None]
    pb = [G2.mul(g, rng.randrange(1, R)) for _ in range(4)] + [G2.mul(g, 3)]
    A = ops.from_affine(enc_g2(pa))
    B = ops.from_affine(enc_g2(pb))
    got = dec_g2_proj(ops.add(A, B))
    want = [G2.add(a, b) for a, b in zip(pa, pb)]
    assert got == want
    # doubling through the same complete formula
    got_d = dec_g2_proj(ops.add(A, A))
    assert got_d == [G2.double(x) for x in pa]
