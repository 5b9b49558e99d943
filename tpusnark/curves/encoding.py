"""Host <-> device point/scalar encoding.

The TPU analog of the reference's host<->device copy layer
(/root/reference/backend/groth16/bn254/icicle/icicle.go:44-126
CopyToDevice/CopyPointsToDevice): here "copy" is just limb encoding into
jax arrays; XLA manages placement.

Host representation: affine points as (x, y) python-int tuples (G1) or
(Fp2, Fp2) tuples (G2); infinity = None — matching curves/ref.py.
Device representation: (X, Y, inf) with coords (n_limbs, N) Montgomery
uint32 limbs; G2 coords are (c0, c1) tuples of limb arrays.
"""

from __future__ import annotations

import numpy as np

from ..fields.jfield import Field, get_field
from ..fields.spec import BN254_FP
from .ref import Fp2


def g1_to_device(points, fp: Field | None = None):
    """list[(x,y) | None] -> (X, Y, inf) device arrays (Montgomery)."""
    fp = fp or get_field(BN254_FP)
    xs, ys, inf = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            inf.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            inf.append(False)
    import jax.numpy as jnp

    return (fp.array(xs), fp.array(ys), jnp.asarray(np.array(inf)))


def g2_to_device(points, fp: Field | None = None):
    """list[(Fp2,Fp2) | None] -> ((X0,X1), (Y0,Y1), inf) device arrays."""
    fp = fp or get_field(BN254_FP)
    x0, x1, y0, y1, inf = [], [], [], [], []
    for pt in points:
        if pt is None:
            x0.append(0)
            x1.append(0)
            y0.append(1)
            y1.append(0)
            inf.append(True)
        else:
            x0.append(pt[0].c0)
            x1.append(pt[0].c1)
            y0.append(pt[1].c0)
            y1.append(pt[1].c1)
            inf.append(False)
    import jax.numpy as jnp

    return (
        (fp.array(x0), fp.array(x1)),
        (fp.array(y0), fp.array(y1)),
        jnp.asarray(np.array(inf)),
    )


def g4_to_device(points, fp: Field):
    """list[(Fp4,Fp4) | None] -> nested ((c00,c01),(c10,c11)) device arrays.

    Host Fp4 elements are tower.make_ext towers (e.c = (fp2_0, fp2_1),
    fp2.c = (Fp, Fp) with .v ints) — the BLS24 G2 coordinate field."""
    import jax.numpy as jnp

    def nest(pt, coord):
        if pt is None:
            # identity placeholder (x, y) = (0, 1)
            return ((0, 0), (0, 0)) if coord == 0 else ((1, 0), (0, 0))
        e = pt[coord]
        return tuple(tuple(f.v for f in f2.c) for f2 in e.c)

    cols = {(i, j, k): [] for i in range(2) for j in range(2) for k in range(2)}
    inf = []
    for pt in points:
        inf.append(pt is None)
        for coord in range(2):
            n = nest(pt, coord)
            for j in range(2):
                for k_ in range(2):
                    cols[(coord, j, k_)].append(n[j][k_])

    def enc(coord, j, k_):
        return fp.array(cols[(coord, j, k_)])

    X = ((enc(0, 0, 0), enc(0, 0, 1)), (enc(0, 1, 0), enc(0, 1, 1)))
    Y = ((enc(1, 0, 0), enc(1, 0, 1)), (enc(1, 1, 0), enc(1, 1, 1)))
    return (X, Y, jnp.asarray(np.array(inf)))


def g4_from_device_proj(pt, fp: Field, fp4_cls, fp2_cls):
    """Projective Fp4 device point -> list[(Fp4, Fp4) | None] host points."""
    X, Y, Z = pt

    def decode(e):
        # e = ((c00,c01),(c10,c11)) limb arrays -> list of Fp4 per batch lane
        vals = [[fp.to_ints(e[j][k]) for k in range(2)] for j in range(2)]
        n = len(vals[0][0])
        out = []
        for i in range(n):
            out.append(
                fp4_cls(
                    (
                        fp2_cls((vals[0][0][i], vals[0][1][i])),
                        fp2_cls((vals[1][0][i], vals[1][1][i])),
                    )
                )
            )
        return out

    xs, ys, zs = decode(X), decode(Y), decode(Z)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z.is_zero():
            out.append(None)
        else:
            zi = z.inv()
            out.append((x * zi, y * zi))
    return out


def g1_from_device_proj(pt, fp: Field | None = None):
    """Projective (X, Y, Z) device point (batch 1 or N) -> list[(x,y)|None]."""
    fp = fp or get_field(BN254_FP)
    X, Y, Z = pt
    xs = fp.to_ints(X)
    ys = fp.to_ints(Y)
    zs = fp.to_ints(Z)
    p = fp.spec.modulus
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, p)
            out.append((x * zi % p, y * zi % p))
    return out


def g2_from_device_proj(pt, fp: Field | None = None, fp2_cls=None, q: int = 1):
    """fp2_cls: the host Fp2 class for the output points (defaults to the
    BN254 one; pass curves.bls12381.Fp2 for BLS12-381). The projective
    inverse is over Fp[u]/(u^2 + q) (q = 5 for BLS12-377)."""
    fp = fp or get_field(BN254_FP)
    fp2_cls = fp2_cls or Fp2
    p = fp.spec.modulus
    (X0, X1), (Y0, Y1), (Z0, Z1) = pt
    x0 = fp.to_ints(X0)
    x1 = fp.to_ints(X1)
    y0 = fp.to_ints(Y0)
    y1 = fp.to_ints(Y1)
    z0 = fp.to_ints(Z0)
    z1 = fp.to_ints(Z1)
    out = []
    for i in range(len(x0)):
        a, b = z0[i] % p, z1[i] % p
        if a == 0 and b == 0:
            out.append(None)
            continue
        # (a + bu)^-1 = (a - bu) / (a^2 + q b^2)  over u^2 = -q
        d = pow((a * a + q * b * b) % p, -1, p)
        za, zb = a * d % p, (-b) * d % p
        xi0, xi1 = x0[i] % p, x1[i] % p
        yi0, yi1 = y0[i] % p, y1[i] % p
        out.append(
            (
                fp2_cls((xi0 * za - q * xi1 * zb) % p, (xi0 * zb + xi1 * za) % p),
                fp2_cls((yi0 * za - q * yi1 * zb) % p, (yi0 * zb + yi1 * za) % p),
            )
        )
    return out
