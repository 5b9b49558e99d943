"""Radix-2 NTT over a Domain, vectorized for TPU.

Covers the reference's FFT surface: ``fft.Domain.FFT/FFTInverse`` with
``OnCoset()`` (used by Groth16's computeH at
/root/reference/backend/groth16/bn254/prove.go:353-396 and by the ICICLE GPU
path's NttOnDevice/INttOnDevice at
/root/reference/backend/groth16/bn254/icicle/icicle.go:453-513).

TPU design: arrays are (n_limbs, n) with the domain axis minor (lanes);
each butterfly stage is a fully-vectorized reshape + one batched Montgomery
multiply of n/2 elements; twiddles come from a single strided (n_limbs, n/2)
table per direction. The bit-reverse permutation is a precomputed gather.
Internal layout/stage order need NOT match gnark's DIF/DIT choices: only
polynomial-level semantics (evaluate / interpolate on the subgroup or its
coset) are part of the contract, and those are tested against the Python
oracle in domain.ntt_ref.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.jfield import Field
from ..fields.spec import FieldSpec
from .domain import Domain, bit_reverse_perm


class NTT:
    """Device NTT bound to (FieldSpec, n). Twiddle tables live on device."""

    def __init__(self, spec: FieldSpec, n: int):
        self.spec = spec
        self.n = n
        self.k = n.bit_length() - 1
        self.field = Field(spec)
        self.domain = Domain(spec, n)
        f = self.field
        d = self.domain
        # (L, n/2) Montgomery twiddles: w^j and w^-j for j < n/2
        if n > 1:
            self._tw_fwd = f.array(d.powers[: n // 2])
            self._tw_inv = f.array(d.powers_inv[: n // 2])
        self._bitrev = jnp.asarray(bit_reverse_perm(n))
        self._n_inv = f.const(d.n_inv, mont=True)
        # coset scale tables (shift^i, and shift^-i pre-scaled by nothing)
        self._coset = None
        self._coset_inv = None
        # jit the public entry points (one compile per input shape).
        # coset variants take the tables as arguments so the lazy table build
        # happens outside any trace (no leaked tracers).
        self.ntt = jax.jit(self.ntt)
        self.intt = jax.jit(self.intt)
        self._ntt_coset_j = jax.jit(
            lambda x, cs: self.ntt(self.field.mul(x, self._bcast_table(cs, x)))
        )
        self._intt_coset_j = jax.jit(
            lambda x, csi: self.field.mul(self.intt(x), self._bcast_table(csi, x))
        )

    # lazily built: only provers that do coset evaluations pay for these
    def _coset_tables(self):
        if self._coset is None:
            f, d = self.field, self.domain
            self._coset = f.array(d.coset_powers(inv=False))
            self._coset_inv = f.array(d.coset_powers(inv=True))
        return self._coset, self._coset_inv

    # ---------------------------------------------------------------- kernels
    def _stages(self, x, table):
        """Iterative DIT butterflies; x must already be bit-reversed.

        x: (L, *batch, n) — the domain axis is LAST, extra middle axes are
        batch (used e.g. to fuse the 3 Groth16 INTTs or to batch four-step
        rows). Stage s (half = 2^s) pairs positions q and q^half inside
        blocks of 2^(s+1), with twiddle w^(stride * (q mod half)).

        Butterfly pairing is STRUCTURED, so even/odd operands come from a
        reshape to (..., groups, 2, half) and static slices — never a
        minor-axis gather (random lane gathers run at ~2 GB/s on TPU and
        made the previous index-based formulation gather-bound: ~500 ms per
        stage at n = 2^22, 11 s per transform). Twiddles are a strided slice
        of the table broadcast across groups. Stages are unrolled in Python
        (22 small reshape/mul/stack graphs; the mul kernel is shape-identical
        across stages so XLA compiles it once)."""
        f = self.field
        n = self.n
        if self.k == 0:
            return x
        shp = x.shape[:-1]
        bcast = (f.n,) + (1,) * (x.ndim - 2)
        for s in range(self.k):
            half = 1 << s
            groups = n // (2 * half)
            stride = n >> (s + 1)
            v = x.reshape(shp + (groups, 2, half))
            e = v[..., 0, :].reshape(shp + (n // 2,))
            o = v[..., 1, :].reshape(shp + (n // 2,))
            # per-stage twiddle row: w^(j*stride) for j < half, tiled across
            # groups -> (L, n/2); transient materialization, bandwidth-cheap
            tw = jax.lax.slice_in_dim(table, 0, half * stride, stride, axis=1)
            tw_full = jnp.broadcast_to(
                tw[:, None, :], (f.n, groups, half)
            ).reshape(f.n, n // 2)
            t = f.mul(o, tw_full.reshape(bcast + (n // 2,)))
            e2 = e.reshape(shp + (groups, half))
            t2 = t.reshape(shp + (groups, half))
            out = jnp.stack([f.add(e2, t2), f.sub(e2, t2)], axis=-2)
            x = out.reshape(shp + (n,))
        return x

    def _bcast_table(self, tbl, x):
        """(L, n) table -> broadcastable against x (L, *batch, n)."""
        return tbl.reshape((self.field.n,) + (1,) * (x.ndim - 2) + (self.n,))

    def ntt(self, x):
        """coefficients -> evaluations on the subgroup (natural order)."""
        if self.n == 1:
            return x
        x = x[..., self._bitrev]
        return self._stages(x, self._tw_fwd)

    def intt(self, x):
        """evaluations (natural order) -> coefficients."""
        if self.n == 1:
            return x
        f = self.field
        x = x[..., self._bitrev]
        x = self._stages(x, self._tw_inv)
        return f.mul(x, f.broadcast_const(self._n_inv, x))

    def coset_scale(self, x, inv: bool = False):
        """Multiply coefficient i by shift^i (or shift^-i)."""
        cs, csi = self._coset_tables()
        return self.field.mul(x, self._bcast_table(csi if inv else cs, x))

    def ntt_coset(self, x):
        """coefficients -> evaluations on the coset shift*<w>."""
        cs, _ = self._coset_tables()
        return self._ntt_coset_j(x, cs)

    def intt_coset(self, x):
        """evaluations on the coset -> coefficients."""
        _, csi = self._coset_tables()
        return self._intt_coset_j(x, csi)


@functools.lru_cache(maxsize=None)
def get_ntt(spec: FieldSpec, n: int) -> NTT:
    return NTT(spec, n)
