"""Multi-chip sharding for the prover hot paths (MSM, NTT).

The reference is a single-process multicore library (SURVEY.md §2.4): its
only "device communication" is host<->GPU memcpy in the icicle path
(/root/reference/backend/groth16/bn254/icicle/icicle.go:31-130). The
TPU-native scaling story replaces that with a jax.sharding.Mesh over chips:

  * MSM: points + scalars sharded along the N axis (data parallel); each
    chip runs the full Pippenger pipeline on its shard; the per-chip partial
    sums (one projective point each) are combined with an all_gather + a
    log-depth tree of complete adds. Collectives ride ICI.
  * NTT: classic four-step decomposition n = n1*n2 — per-chip column NTTs,
    a global transpose (XLA lowers the resharding to all_to_all over ICI),
    twiddle scaling, per-chip row NTTs. This is the "sequence parallel"
    analog for large polynomial domains (SURVEY.md §5 long-context).

MSM uses shard_map (the collective pattern is explicit); NTT uses
with_sharding_constraint inside one jit program (annotate shardings, let
XLA insert the transpose collectives — the scaling-book recipe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..msm.pippenger import MSM

tree_map = jax.tree_util.tree_map


def tree_add_batch(ops, pts, n: int):
    """Reduce a trailing batch axis of n projective points with log2(n)
    rounds of complete adds (pads odd sizes with the identity)."""
    while n > 1:
        if n % 2:
            ident = ops.identity_like(tree_map(lambda a: a[..., :1], pts)[0])
            pts = tree_map(
                lambda a, i: jnp.concatenate([a, i], axis=-1), pts, tuple(ident)
            )
            n += 1
        half = n // 2
        lo = tree_map(lambda a: a[..., :half], pts)
        hi = tree_map(lambda a: a[..., half:], pts)
        pts = ops.add(lo, hi)
        n = half
    return pts


class ShardedMSM:
    """MSM over a 1D mesh axis: N points split across chips, partial sums
    all_gathered and tree-reduced on every chip (result replicated)."""

    def __init__(self, msm: MSM, mesh: Mesh, axis: str = "data"):
        self.msm = msm
        self.mesh = mesh
        self.axis = axis
        ops = msm.ops
        n_dev = mesh.shape[axis]

        def local(points, scalars):
            part = msm._msm_impl(points, scalars)  # projective, batch 1
            allp = tree_map(
                lambda a: jax.lax.all_gather(a, axis, axis=a.ndim - 1, tiled=True),
                part,
            )
            return tree_add_batch(ops, allp, n_dev)

        def local_many(points, scalars):
            # scalars (L, k, N_local) -> per-shard partials (.., k); gather
            # along a NEW trailing device axis then tree-reduce it
            part = msm._msm_many_impl(points, scalars)
            allp = tree_map(
                lambda a: jnp.moveaxis(
                    jax.lax.all_gather(a, axis, axis=0, tiled=False), 0, -1
                ),
                part,
            )  # (.., k, n_dev)
            red = tree_add_batch(ops, allp, n_dev)  # (.., k, 1)
            return tree_map(lambda a: a[..., 0], red)

        self._local = local
        self._local_many = local_many
        self._fn = None
        self._fn_many = None

    def shard_points(self, points):
        """Materialize a point table in its mesh-sharded layout (do this ONCE
        per table at prover build; resharding per call would defeat HBM
        residency)."""
        return tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(self.mesh, P(*([None] * (a.ndim - 1) + [self.axis])))
            ),
            points,
        )

    def __call__(self, points, scalars):
        """points: (X, Y, inf) with N divisible by mesh size (coords may be
        (c0, c1) tuples for G2); scalars: (L, N) normal form. Returns a
        replicated projective point (batch 1).

        Scalars are canonicalized to the N-sharded layout before the call so
        the program compiles ONCE regardless of where the caller's scalars
        live (jit's compile cache is keyed on input shardings)."""
        scalars = jax.device_put(
            scalars, NamedSharding(self.mesh, P(None, self.axis))
        )
        if self._fn is None:
            ax = self.axis
            # specs follow the pytree structure of the inputs
            in_pts = tree_map(lambda a: P(*([None] * (a.ndim - 1) + [ax])), points)
            in_sc = P(None, ax)
            # result is projective (X, Y, Z); Z has X's tree structure
            out = tree_map(lambda a: P(), (points[0], points[1], points[0]))
            self._fn = jax.jit(
                jax.shard_map(
                    self._local,
                    mesh=self.mesh,
                    in_specs=(in_pts, in_sc),
                    out_specs=out,
                    check_vma=False,
                )
            )
        return self._fn(points, scalars)

    def many(self, points, scalars):
        """k MSMs over the same sharded points: scalars (L, k, N) normal
        form -> replicated projective point with batch k (the sharded face
        of MSM.many; used by the sharded PLONK prover's grouped commits)."""
        scalars = jax.device_put(
            scalars, NamedSharding(self.mesh, P(None, None, self.axis))
        )
        if self._fn_many is None:
            ax = self.axis
            in_pts = tree_map(
                lambda a: P(*([None] * (a.ndim - 1) + [ax])), points
            )
            in_sc = P(None, None, ax)
            out = tree_map(lambda a: P(), (points[0], points[1], points[0]))
            self._fn_many = jax.jit(
                jax.shard_map(
                    self._local_many,
                    mesh=self.mesh,
                    in_specs=(in_pts, in_sc),
                    out_specs=out,
                    check_vma=False,
                )
            )
        return self._fn_many(points, scalars)


class ShardedNTT:
    """Four-step NTT of size n = n1*n2 over a 1D mesh axis.

    Math (standard Cooley-Tukey decimation): with j = j1*n2 + j2 and
    k = k1 + n1*k2,

        X[k1 + n1*k2] = NTT_n2 over j2 [ w^(j2*k1) * NTT_n1 over j1 [x] ]

    where the inner size-n1 NTT uses root w^n2 and the outer size-n2 NTT
    uses root w^n1 — both are exactly the generators Domain() derives for
    those sizes (all powers of the same 2-adic root).

    Sharding: stage 1 is batched over j2 (shard j2), stage 2 is batched over
    k1 (shard k1); the re-shard in between is the distributed transpose.
    """

    def __init__(self, spec, n: int, mesh: Mesh, axis: str = "data"):
        from ..poly.domain import Domain
        from ..poly.ntt import get_ntt

        self.mesh = mesh
        self.axis = axis
        self.n = n
        n_dev = mesh.shape[axis]
        n1 = n_dev
        if n1 * n1 > n:
            n1 = 1
            while n1 * n1 < n:
                n1 *= 2
        n2 = n // n1
        assert n1 * n2 == n
        self.n1, self.n2 = n1, n2
        self.ntt1 = get_ntt(spec, n1)
        self.ntt2 = get_ntt(spec, n2)
        self.field = self.ntt2.field
        f = self.field
        p = spec.modulus
        big = Domain(spec, n)
        self.domain = big
        w = big.generator
        # twiddle matrix w^(k1*j2) (and inverse), (L, n1, n2), Montgomery
        flat = [pow(w, k1 * j2, p) for k1 in range(n1) for j2 in range(n2)]
        self._tw = f.array(flat).reshape(f.n, n1, n2)
        self._tw_inv = f.array([pow(v, -1, p) for v in flat]).reshape(f.n, n1, n2)
        self._n_inv = f.const(pow(n, -1, p), mont=True)

        L = f.n
        # shard a stage only when its factor divides the mesh; tiny domains
        # (n < n_dev^2) replicate the short stage instead of failing
        sh_j2 = NamedSharding(
            mesh, P(None, None, axis) if n2 % n_dev == 0 else P()
        )  # shard last axis (j2/k2)
        sh_k1 = NamedSharding(
            mesh, P(None, axis, None) if n1 % n_dev == 0 else P()
        )  # shard middle axis (k1)
        self._out_sh = NamedSharding(
            mesh, P(None, axis) if n % n_dev == 0 else P()
        )
        wsc = jax.lax.with_sharding_constraint

        def fourstep(x, tw, inverse: bool):
            ntt_a, ntt_b = (self.ntt1, self.ntt2)
            stage1 = ntt_a.intt if inverse else ntt_a.ntt
            stage2 = ntt_b.intt if inverse else ntt_b.ntt
            xm = x.reshape(L, n1, n2)
            xm = wsc(xm, sh_j2)
            # inner NTT over j1: move j1 last, batch over (sharded) j2
            xm = jnp.swapaxes(xm, 1, 2)  # (L, n2, n1)
            xm = stage1(xm)
            xm = jnp.swapaxes(xm, 1, 2)  # (L, n1, n2), index (k1, j2)
            xm = f.mul(xm, tw)
            xm = wsc(xm, sh_k1)
            xm = stage2(xm)  # over j2 axis (last), batch over (sharded) k1
            # xm[k1, k2] = X[k1 + n1*k2]; natural order = transpose+flatten
            out = jnp.swapaxes(xm, 1, 2).reshape(L, n)
            return wsc(out, self._out_sh)

        # coset tables for the quotient computation (lazy, like poly.ntt)
        self._coset_tbl = None
        self._coset_inv_tbl = None

        self._fwd = jax.jit(lambda x: fourstep(x, self._tw, False))

        def inv(x):
            # inverse: run the forward network with inverse stage transforms
            # and inverse twiddles on the TRANSPOSED problem. Easiest correct
            # formulation: INTT(x) = fourstep_inv where input index (k1,k2)
            # comes from natural k = k1 + n1*k2 -> x.reshape(L, n2, n1)
            # swapped; run stages in reverse order.
            xm = x.reshape(L, n2, n1)  # index (k2, k1)
            xm = jnp.swapaxes(xm, 1, 2)  # (L, n1, n2) index (k1, k2)
            xm = wsc(xm, sh_k1)
            xm = self.ntt2.intt(xm)  # undo stage2 over k2 axis -> (k1, j2)
            # intt includes 1/n2 scaling; combined with stage-1 intt's 1/n1
            # this yields the full 1/n factor automatically.
            xm = f.mul(xm, self._tw_inv)
            xm = wsc(xm, sh_j2)
            xm = jnp.swapaxes(xm, 1, 2)  # (L, n2, j1-last)
            xm = self.ntt1.intt(xm)
            xm = jnp.swapaxes(xm, 1, 2)  # (L, n1, n2) index (j1, j2)
            out = xm.reshape(L, n)
            return wsc(out, self._out_sh)

        self._inv = jax.jit(inv)

    def _canon(self, x):
        """Canonicalize input sharding (N-sharded) so _fwd/_inv compile once
        each; callers hand in both host-fresh and mesh-sharded arrays."""
        return jax.device_put(x, NamedSharding(self.mesh, P(None, self.axis)))

    def ntt(self, x):
        """(L, n) coefficients -> evaluations, natural order, sharded out."""
        return self._fwd(self._canon(x))

    def intt(self, x):
        """(L, n) evaluations -> coefficients."""
        return self._inv(self._canon(x))

    # --------------------------------------------------------------- coset
    def _cosets(self):
        if self._coset_tbl is None:
            f = self.field
            self._coset_tbl = f.array(self.domain.coset_powers(inv=False))
            self._coset_inv_tbl = f.array(self.domain.coset_powers(inv=True))
        return self._coset_tbl, self._coset_inv_tbl

    def ntt_coset(self, x):
        cs, _ = self._cosets()
        return self.ntt(self.field.mul(x, cs))

    def intt_coset(self, x):
        _, csi = self._cosets()
        return self.field.mul(self.intt(x), csi)
