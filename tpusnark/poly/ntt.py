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
    """Device NTT bound to (FieldSpec, n). Twiddle tables live on device.

    Two regimes:
      * n < FOUR_STEP_MIN: iterative last-axis DIT butterflies (_stages).
      * n >= FOUR_STEP_MIN: single-chip FOUR-STEP decomposition n = n1 x n2
        (the on-chip analog of parallel/sharding.ShardedNTT; reference
        counterpart: fft.Domain's any-n FFT used by computeH,
        /root/reference/backend/groth16/bn254/prove.go:353-396).

        Why: TPU arrays are tiled (8, 128) over the two minor dims. A
        last-axis butterfly at stage s has a trailing dim of 2^s; for
        2^s < 128 every intermediate is padded up to 16x, and at n = 2^22
        the padded stage buffers (2 GB each) OOMed the 16 GB chip. In the
        four-step form every butterfly runs along axis -2 of a
        (..., sub_n, batch) array whose minor dim is n2 or n1 (>= 2^8), so
        nothing ever pads, and peak HBM is a handful of (L, n) buffers.
    """

    FOUR_STEP_MIN = 1 << 16

    def __init__(self, spec: FieldSpec, n: int):
        self.spec = spec
        self.n = n
        self.k = n.bit_length() - 1
        self.field = Field(spec)
        self.domain = Domain(spec, n)
        f = self.field
        d = self.domain
        # Packed per-stage twiddle tables, (L, n-1) Montgomery: stage s
        # (half = 2^s) occupies columns [2^s - 1, 2^(s+1) - 1) and holds
        # w^(j * (n >> (s+1))) for j < 2^s. Packing makes every stage's
        # twiddle row a CONTIGUOUS static slice — the previous strided slice
        # of one (L, n/2) table forced XLA:TPU to stage the whole table
        # through scoped VMEM per stage (16 MB limit, OOM at n >= 2^20).
        if 1 < n < self.FOUR_STEP_MIN:
            p = spec.modulus
            w = d.generator
            w_inv = pow(w, -1, p)

            def packed(base):
                out = []
                for s in range(self.k):
                    half = 1 << s
                    step = pow(base, n >> (s + 1), p)
                    v = 1
                    for _ in range(half):
                        out.append(v)
                        v = v * step % p
                return out

            self._tw_fwd = f.array(packed(w))
            self._tw_inv = f.array(packed(w_inv))
            self._bitrev = jnp.asarray(bit_reverse_perm(n))
        self._n_inv = f.const(d.n_inv, mont=True)
        self._bfly_fused = None
        self._bfly4_fused = None
        # coset scale tables (shift^i, and shift^-i pre-scaled by nothing)
        self._coset = None
        self._coset_inv = None
        # four-step split (large n): n1 >= n2, sub-transforms reuse the
        # cached NTT engines (Domain guarantees generator(n_sub) = w^(n/n_sub))
        if n >= self.FOUR_STEP_MIN:
            k1 = (self.k + 1) // 2
            self.n1, self.n2 = 1 << k1, n >> k1
            self._sub1 = get_ntt(spec, self.n1)
            self._sub2 = get_ntt(spec, self.n2)
            self._twmat = None  # (fwd, inv) built lazily on device
            run, irun = self._ntt4_run, self._intt4_run
        else:
            run, irun = self._ntt_run, self._intt_run
        # jit the entry points (one compile per input shape). ALL large
        # tables (twiddles, coset powers) are passed as ARGUMENTS, never
        # closed over: a closed-over device array becomes an XLA constant,
        # and the per-stage slice+broadcast of a constant twiddle table gets
        # constant-folded into 22 distinct (L, n/2) literals — ~3 GB of HBM
        # at n = 2^22, which OOMed the 16 GB chip in round 3. As arguments
        # the broadcasts stay runtime ops (transient, bandwidth-cheap).
        self._ntt_j = jax.jit(run)
        self._intt_j = jax.jit(irun)
        self._ntt_coset_j = jax.jit(
            lambda x, tw, cs: run(self.field.mul(x, self._bcast_table(cs, x)), tw)
        )
        self._intt_coset_j = jax.jit(
            lambda x, tw, csi: self.field.mul(
                irun(x, tw), self._bcast_table(csi, x)
            )
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
            v = x.reshape(shp + (groups, 2, half))
            e = v[..., 0, :].reshape(shp + (n // 2,))
            o = v[..., 1, :].reshape(shp + (n // 2,))
            # per-stage twiddle row: contiguous slice of the packed table
            # (see __init__), tiled across groups -> (L, n/2); transient
            # materialization, bandwidth-cheap
            tw = jax.lax.slice_in_dim(table, half - 1, 2 * half - 1, 1, axis=1)
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

    # -------------------------------------------------------- four-step (big n)
    def _butterfly(self, e, o, tw):
        """(e + o*tw, e - o*tw) on flat (L, N) arrays — ONE kernel on TPU.

        Unfused, the add/sub carry chains (jnp.pad-based Kogge-Stone) break
        XLA elementwise fusion into ~10 HBM round trips each; fusing the
        whole butterfly keeps the stage at 5 array reads/writes total."""
        f = self.field
        fb = self._bfly_fused
        if fb is None:
            from ..fields.fuse import fuse

            def step(e, o, tw):
                t = f.mul(o, tw)
                return f.add(e, t), f.sub(e, t)

            fb = self._bfly_fused = fuse(step)
        import jax as _jax

        if _jax.default_backend() != "tpu":
            t = f.mul(o, tw)
            return f.add(e, t), f.sub(e, t)
        return fb(e, o, tw)

    def _butterfly4(self, x0, x1, x2, x3, w1, w2a, w2b):
        """Fused RADIX-4 step = two DIT radix-2 stages in ONE kernel on
        flat (L, N) arrays: 4 muls (two stacked mul calls) + 8 add/sub.

        Halves the per-stage HBM round trips of the value arrays and the
        inter-stage stack/reshape copies — the four-step NTT at 2^22 was
        ~55% non-compute overhead in the per-stage radix-2 form."""
        f = self.field
        fb = self._bfly4_fused
        if fb is None:
            from ..fields.fuse import fuse

            def step(x0, x1, x2, x3, w1, w2a, w2b):
                st = jnp.stack
                T = f.mul(st([x1, x3], axis=1), st([w1, w1], axis=1))
                t1, t3 = T[:, 0], T[:, 1]
                Y = f.add(st([x0, x2], axis=1), st([t1, t3], axis=1))
                Z = f.sub(st([x0, x2], axis=1), st([t1, t3], axis=1))
                y0, y2 = Y[:, 0], Y[:, 1]
                y1, y3 = Z[:, 0], Z[:, 1]
                U = f.mul(st([y2, y3], axis=1), st([w2a, w2b], axis=1))
                u2, u3 = U[:, 0], U[:, 1]
                P = f.add(st([y0, y1], axis=1), st([u2, u3], axis=1))
                Q = f.sub(st([y0, y1], axis=1), st([u2, u3], axis=1))
                # z0 = y0+u2, z1 = y1+u3, z2 = y0-u2, z3 = y1-u3
                return P[:, 0], P[:, 1], Q[:, 0], Q[:, 1]

            fb = self._bfly4_fused = fuse(step)
        import jax as _jax

        if _jax.default_backend() != "tpu":
            t1 = self.field.mul(x1, w1)
            t3 = self.field.mul(x3, w1)
            y0, y1 = self.field.add(x0, t1), self.field.sub(x0, t1)
            y2, y3 = self.field.add(x2, t3), self.field.sub(x2, t3)
            u2 = self.field.mul(y2, w2a)
            u3 = self.field.mul(y3, w2b)
            return (
                self.field.add(y0, u2),
                self.field.add(y1, u3),
                self.field.sub(y0, u2),
                self.field.sub(y1, u3),
            )
        return fb(x0, x1, x2, x3, w1, w2a, w2b)

    def _stages_mid(self, x, table, k: int):
        """DIT butterflies along axis -2 of x (L, *mid, A, B), pre-bit-
        reversed along that axis; twiddles from the sub-NTT's packed table.
        The minor axis B rides along untouched, so every intermediate keeps
        a large trailing dim (TPU layout-friendly; see class docstring).
        Stages run in PAIRS through the fused radix-4 kernel (_butterfly4);
        an odd final stage falls back to the radix-2 kernel."""
        f = self.field
        L = f.n
        *lead, A, B = x.shape
        mid = tuple(lead[1:])
        s = 0
        while s + 1 < k:
            half = 1 << s
            groups = A // (4 * half)
            v = x.reshape((L,) + mid + (groups, 4, half, B))
            xs = [v[..., i, :, :] for i in range(4)]  # (L,*mid,groups,half,B)
            shp = xs[0].shape

            def bc(tw_slice, width):
                return jnp.broadcast_to(
                    tw_slice.reshape((L,) + (1,) * len(mid) + (1, width, 1)),
                    shp,
                )

            w1 = bc(
                jax.lax.slice_in_dim(table, half - 1, 2 * half - 1, 1, axis=1),
                half,
            )
            w2 = jax.lax.slice_in_dim(
                table, 2 * half - 1, 4 * half - 1, 1, axis=1
            )
            w2a = bc(jax.lax.slice_in_dim(w2, 0, half, 1, axis=1), half)
            w2b = bc(jax.lax.slice_in_dim(w2, half, 2 * half, 1, axis=1), half)
            outs = self._butterfly4(
                *[a.reshape(L, -1) for a in xs],
                w1.reshape(L, -1),
                w2a.reshape(L, -1),
                w2b.reshape(L, -1),
            )
            outs = [o.reshape(shp) for o in outs]
            x = jnp.stack(outs, axis=-3).reshape((L,) + mid + (A, B))
            s += 2
        if s < k:
            half = 1 << s
            groups = A // (2 * half)
            v = x.reshape((L,) + mid + (groups, 2, half, B))
            e = v[..., 0, :, :]
            o = v[..., 1, :, :]
            tw = jax.lax.slice_in_dim(table, half - 1, 2 * half - 1, 1, axis=1)
            twf = jnp.broadcast_to(
                tw.reshape((L,) + (1,) * len(mid) + (1, half, 1)), e.shape
            )
            aa, bb = self._butterfly(
                e.reshape(L, -1), o.reshape(L, -1), twf.reshape(L, -1)
            )
            aa = aa.reshape(e.shape)
            bb = bb.reshape(e.shape)
            x = jnp.stack([aa, bb], axis=-3).reshape((L,) + mid + (A, B))
        return x

    def _twmats(self):
        """(fwd, inv) four-step twiddle matrices w^(+-k1*j2), (L, n1, n2)
        Montgomery, built ON DEVICE by a scan (n total muls — a host build
        would be 2n Python modmuls + a 4M-element encode at n = 2^22)."""
        if self._twmat is None:
            f, p = self.field, self.spec.modulus
            w = self.domain.generator

            def build(base):
                step = f.array([pow(base, k1, p) for k1 in range(self.n1)])
                col0 = f.array([1] * self.n1)

                def run(c0, st):
                    def body(c, _):
                        return f.mul(c, st), c

                    _, cols = jax.lax.scan(body, c0, None, length=self.n2)
                    return jnp.moveaxis(cols, 0, -1)  # (L, n1, n2)

                return jax.jit(run)(col0, step)

            self._twmat = (build(w), build(pow(w, -1, p)))
        return self._twmat

    def _fwd_tables(self):
        if self.n >= self.FOUR_STEP_MIN:
            return (self._sub1._tw_fwd, self._sub2._tw_fwd, self._twmats()[0])
        return self._tw_fwd

    def _inv_tables(self):
        if self.n >= self.FOUR_STEP_MIN:
            return (self._sub1._tw_inv, self._sub2._tw_inv, self._twmats()[1])
        return self._tw_inv

    def _ntt4_run(self, x, tables):
        """Four-step NTT: X[k1 + n1*k2] = NTT2_{j2->k2}( w^(k1*j2) *
        NTT1_{j1->k1}( x[j1*n2 + j2] ) ). Output in natural order."""
        t1, t2, tm = tables
        f = self.field
        L = f.n
        n1, n2 = self.n1, self.n2
        shp = x.shape[:-1]
        y = x.reshape(shp + (n1, n2))
        y = jnp.take(y, self._sub1._bitrev, axis=-2)
        y = self._stages_mid(y, t1, self._sub1.k)  # [k1, j2]
        tmb = jnp.broadcast_to(
            tm.reshape((L,) + (1,) * (len(shp) - 1) + (n1, n2)), y.shape
        )
        y = f.mul(y.reshape(L, -1), tmb.reshape(L, -1)).reshape(y.shape)
        y = jnp.swapaxes(y, -1, -2)  # (..., n2, n1) [j2, k1]
        y = jnp.take(y, self._sub2._bitrev, axis=-2)
        y = self._stages_mid(y, t2, self._sub2.k)  # [k2, k1]
        return y.reshape(shp + (self.n,))  # k = k1 + n1*k2 = row-major flatten

    def _intt4_run(self, x, tables):
        f = self.field
        y = self._ntt4_run(x, tables)
        return f.mul(y, f.broadcast_const(self._n_inv, y))

    def _ntt_run(self, x, table):
        return self._stages(x[..., self._bitrev], table)

    def _intt_run(self, x, table):
        f = self.field
        x = self._stages(x[..., self._bitrev], table)
        return f.mul(x, f.broadcast_const(self._n_inv, x))

    def ntt(self, x):
        """coefficients -> evaluations on the subgroup (natural order)."""
        if self.n == 1:
            return x
        return self._ntt_j(x, self._fwd_tables())

    def intt(self, x):
        """evaluations (natural order) -> coefficients."""
        if self.n == 1:
            return x
        return self._intt_j(x, self._inv_tables())

    def coset_scale(self, x, inv: bool = False):
        """Multiply coefficient i by shift^i (or shift^-i)."""
        cs, csi = self._coset_tables()
        return self.field.mul(x, self._bcast_table(csi if inv else cs, x))

    def ntt_coset(self, x):
        """coefficients -> evaluations on the coset shift*<w>."""
        if self.n == 1:
            return x
        cs, _ = self._coset_tables()
        return self._ntt_coset_j(x, self._fwd_tables(), cs)

    def intt_coset(self, x):
        """evaluations on the coset -> coefficients."""
        if self.n == 1:
            return x
        _, csi = self._coset_tables()
        return self._intt_coset_j(x, self._inv_tables(), csi)


@functools.lru_cache(maxsize=None)
def get_ntt(spec: FieldSpec, n: int) -> NTT:
    return NTT(spec, n)
