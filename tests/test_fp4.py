"""Fp4Arith device tower kernels vs the generic host tower (fast tier).

The BLS24 G2 coordinate field (jcurve.Fp4Arith: Karatsuba over Fp2 over the
shared Field limb kernels) checked against curves/tower.py's independent
python-int arithmetic, plus the signed-digit recoding invariant the MSM
rests on (pippenger.window_digits_signed)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusnark.curves import bls24315, bls24317
from tpusnark.curves.jcurve import Fp4Arith, g2_ops_fp4
from tpusnark.fields.jfield import get_field
from tpusnark.fields.spec import BLS24_315_FP, BLS24_317_FP, BN254_FR
from tpusnark.msm.pippenger import window_digits_signed


def _mk(mod, spec):
    fp = get_field(spec)
    fa = Fp4Arith(fp, mod.B3_NEST, a2=mod.A2, z2=mod.Z2)
    return mod, fp, fa


def _enc(fp, ints_pair_pair):
    """((c00,c01),(c10,c11)) ints -> device Fp4 element (batch 1)."""
    return tuple(
        tuple(jnp.asarray(fp.spec.encode([c]).T.copy()) for c in pair)
        for pair in ints_pair_pair
    )


def _dec(fp, e):
    return tuple(tuple(fp.to_ints(c)[0] for c in pair) for pair in e)


def _host(mod, nest):
    return mod.fp4(nest)


def _nest(e):
    return tuple(tuple(f.v for f in f2.c) for f2 in e.c)


@pytest.mark.parametrize(
    "mod,spec",
    [(bls24315, BLS24_315_FP), (bls24317, BLS24_317_FP)],
    ids=["315", "317"],
)
def test_fp4_mul_add_vs_tower(mod, spec):
    mod, fp, fa = _mk(mod, spec)
    rng = random.Random(3)
    p = mod.P

    def rand_nest():
        return tuple(
            tuple(rng.randrange(p) for _ in range(2)) for _ in range(2)
        )

    for _ in range(4):
        an, bn = rand_nest(), rand_nest()
        a, b = _enc(fp, an), _enc(fp, bn)
        ha, hb = _host(mod, an), _host(mod, bn)
        got_mul = _dec(fp, jax.jit(fa.mul)(a, b))
        assert got_mul == _nest(ha * hb)
        got_add = _dec(fp, jax.jit(fa.add)(a, b))
        assert got_add == _nest(ha + hb)
        got_sub = _dec(fp, jax.jit(fa.sub)(a, b))
        assert got_sub == _nest(ha - hb)


def test_fp4_g2_double_vs_host():
    """Device projective double of the BLS24-315 G2 generator vs host."""
    mod, fp, _ = _mk(bls24315, BLS24_315_FP)
    ops = g2_ops_fp4(fp, mod.B3_NEST, a2=mod.A2, z2=mod.Z2)
    g = mod.G2.generator()
    gx, gy = _nest(g[0]), _nest(g[1])
    X, Y = _enc(fp, gx), _enc(fp, gy)
    one = tuple(
        tuple(
            jnp.asarray(fp.spec.encode([1 if (i, j) == (0, 0) else 0]).T.copy())
            for j in range(2)
        )
        for i in range(2)
    )
    d = jax.jit(ops.double)((X, Y, one))
    want = mod.G2.double(g)
    # affinize: x = X/Z, y = Y/Z over host Fp4
    Xh = _host(mod, _dec(fp, d[0]))
    Yh = _host(mod, _dec(fp, d[1]))
    Zh = _host(mod, _dec(fp, d[2]))
    zi = Zh.inv()
    assert _nest(Xh * zi) == _nest(want[0])
    assert _nest(Yh * zi) == _nest(want[1])


def test_signed_digit_recoding_reconstructs():
    """sum_w 2^(cw) * (+-mag_w) == scalar, magnitudes <= 2^(c-1)."""
    fr = get_field(BN254_FR)
    p = BN254_FR.modulus
    rng = np.random.default_rng(9)
    scalars = [int(rng.integers(0, 1 << 63)) ** 4 % p for _ in range(8)] + [
        0,
        1,
        p - 1,
    ]
    arr = jnp.asarray(fr.spec.encode(scalars, mont=False).T.copy())
    for c in (13, 16):
        W = -(-(p.bit_length() + 1) // c)
        mags, signs = jax.jit(
            lambda s: window_digits_signed(s, fr.n, c, W)
        )(arr)
        mags, signs = np.asarray(mags), np.asarray(signs)
        assert mags.max() <= 1 << (c - 1)
        for j, s in enumerate(scalars):
            acc = 0
            for w in range(W):
                d = int(mags[w, j]) * (-1 if signs[w, j] else 1)
                acc += d << (c * w)
            assert acc == s, (c, j)
