"""Batched fixed-base scalar multiplication on device.

TPU-native analog of gnark-crypto's ``BatchScalarMultiplicationG1/G2`` used by
Groth16 setup for all proving-key points
(/root/reference/backend/groth16/bn254/setup.go:251).

Strategy: the base is FIXED, so precompute the 2^k·G ladder on the host
(cheap: ~254 doublings with python ints) and run a fully batched
bit-scan on device: 254 complete mixed additions over the whole scalar
vector, each lane conditionally accepting table[k] via select. No per-lane
branching, no buckets — the double-and-add "double" is amortized into the
host table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.jfield import Field
from .jcurve import CurveOps

tree_map = jax.tree_util.tree_map


class FixedBaseMul:
    """Bound to (ops, fp field, scalar bits). Call with a host ladder table."""

    def __init__(self, ops: CurveOps, fr: Field, n_bits: int | None = None):
        self.ops = ops
        self.fr = fr
        self.n_bits = n_bits or fr.spec.modulus.bit_length()
        self._jit = jax.jit(self._impl)

    def __call__(self, table_xy, scalars_norm):
        """table_xy: (X, Y) coord arrays with trailing axis n_bits (the host
        2^k·G ladder, never infinity); scalars_norm: (L, N) normal-form limbs.
        Returns projective points with batch N."""
        return self._jit(table_xy, scalars_norm)

    def _impl(self, table_xy, scalars):
        ops = self.ops
        tX, tY = table_xy
        N = scalars.shape[-1]
        # acc: batch-N identity
        x_templ = tree_map(
            lambda a: jnp.zeros(a.shape[:-1] + (N,), a.dtype), tX
        )
        acc0 = ops.identity_like(x_templ)

        def body(k, acc):
            limb = k >> 4
            sc = jax.lax.dynamic_index_in_dim(scalars, limb, axis=0, keepdims=False)
            bit = (sc >> (jnp.uint32(k) & jnp.uint32(15))) & jnp.uint32(1)
            pt_k = (
                tree_map(lambda a: jax.lax.dynamic_slice_in_dim(a, k, 1, axis=-1), tX),
                tree_map(lambda a: jax.lax.dynamic_slice_in_dim(a, k, 1, axis=-1), tY),
            )
            # broadcast the single table point against the batch
            nxt = ops.add_mixed(acc, pt_k)
            return ops.select(bit == 1, nxt, acc)

        return jax.lax.fori_loop(0, self.n_bits, body, acc0)


class VarBaseMul:
    """Batched VARIABLE-base scalar multiplication: lane i computes
    s_i * P_i. The device analog of the reference MPC ceremony's
    scaleG1InPlace/scaleG2InPlace loops
    (/root/reference/backend/groth16/bn254/mpcsetup/utils.go:83-102), which
    scalar-multiply every SRS point by a distinct power of tau per
    contribution.

    MSB-first double-and-add over the whole lane batch: n_bits complete
    doublings + n_bits conditional complete mixed adds (branch-free selects).
    """

    def __init__(self, ops: CurveOps, fr: Field, n_bits: int | None = None):
        self.ops = ops
        self.fr = fr
        self.n_bits = n_bits or fr.spec.modulus.bit_length()
        self._jit = jax.jit(self._impl)

    def __call__(self, points_affine, scalars_norm):
        """points: (X, Y, inf) affine with batch N; scalars: (L, N)
        normal-form 16-bit limbs. Returns projective points, batch N."""
        return self._jit(points_affine, scalars_norm)

    def _impl(self, points_affine, scalars):
        ops = self.ops
        X, Y, inf = points_affine
        acc0 = ops.identity_like(X)
        pt = (X, Y)

        def body(j, acc):
            k = self.n_bits - 1 - j
            limb = k >> 4
            sc = jax.lax.dynamic_index_in_dim(scalars, limb, axis=0, keepdims=False)
            bit = (sc >> (jnp.uint32(k) & jnp.uint32(15))) & jnp.uint32(1)
            acc = ops.double(acc)
            nxt = ops.add_mixed(acc, pt)
            return ops.select((bit == 1) & ~inf, nxt, acc)

        return jax.lax.fori_loop(0, self.n_bits, body, acc0)


def _host_mod(curve: str):
    if curve == "bn254":
        from . import ref

        return ref
    if curve == "bls12-377":
        from . import bls12377

        return bls12377
    if curve == "bw6-761":
        from . import bw6761

        return bw6761
    from . import bls12381

    return bls12381


@functools.lru_cache(maxsize=8)
def _g1_ladder_host(n_bits: int, curve: str = "bn254"):
    """2^k * G1 generator for k < n_bits, python ints."""
    G1 = _host_mod(curve).G1
    out = []
    p = G1.generator()
    for _ in range(n_bits):
        out.append(p)
        p = G1.double(p)
    return out


def g1_generator_ladder(fp: Field, n_bits: int, curve: str = "bn254"):
    """Device (X, Y) arrays, trailing axis n_bits."""
    pts = _g1_ladder_host(n_bits, curve)
    return (fp.array([pt[0] for pt in pts]), fp.array([pt[1] for pt in pts]))


@functools.lru_cache(maxsize=8)
def _g2_ladder_host(n_bits: int, curve: str = "bn254"):
    G2 = _host_mod(curve).G2
    out = []
    p = G2.generator()
    for _ in range(n_bits):
        out.append(p)
        p = G2.double(p)
    return out


def g2_generator_ladder(fp: Field, n_bits: int, curve: str = "bn254"):
    pts = _g2_ladder_host(n_bits, curve)
    if isinstance(pts[0][0], int):  # g2-over-fp curve (BW6-761)
        return (fp.array([pt[0] for pt in pts]), fp.array([pt[1] for pt in pts]))
    X = (fp.array([pt[0].c0 for pt in pts]), fp.array([pt[0].c1 for pt in pts]))
    Y = (fp.array([pt[1].c0 for pt in pts]), fp.array([pt[1].c1 for pt in pts]))
    return (X, Y)
