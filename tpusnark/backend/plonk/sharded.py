"""Multi-chip PLONK prover: the stage-jitted prover of prove.py driven over
a jax.sharding.Mesh.

BASELINE's north star names "quotient-polynomial and FFT passes partitioned
per host"; the reference itself has NO multi-node PLONK (its prover is an
11-goroutine shared-memory DAG, /root/reference/backend/plonk/bn254/
prove.go:139-169), so this sharding design is TPU-native:

  * Every KZG commitment (the MSM hot path) runs as an explicit
    shard_map program over SRS points sharded along the mesh axis, with
    all_gather + log-tree reduction of the per-chip partials
    (parallel.sharding.ShardedMSM / .many — grouped commits share one
    composite-key MSM program exactly like the single-chip prover).
  * The domain-sized polynomial arrays (wire columns, quotient slices)
    enter the stage jits pinned to the mesh with a trailing-axis
    NamedSharding; XLA's SPMD partitioner splits the elementwise limb
    algebra per shard and inserts the all_to_all/collective-permute for
    the NTT reshapes (the scaling-book recipe: annotate shardings, let
    XLA place collectives).

The proof distribution and transcript are bit-identical to prove() — the
same stage functions run, jit-specialized on the sharded input layouts —
so proofs verify under the standard verifier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ...constraint.scs import SparseConstraintSystem
from ...fields.jfield import get_field
from ...fields.spec import BN254_FR
from ...msm.pippenger import get_msm_for
from ...parallel.sharding import ShardedMSM
from .keys import PlonkProof, PlonkProvingKey
from .prove import prove as _prove

_fr = get_field(BN254_FR)


class ShardedPlonkEngine:
    """Commit/placement backend for prove(..., engine=...) over a mesh."""

    def __init__(self, pk: PlonkProvingKey, mesh, axis: str = "data"):
        from ...curves.encoding import g1_to_device

        self.mesh = mesh
        self.axis = axis
        n_dev = mesh.shape[axis]
        n_srs = len(pk.srs.g1)
        # identity-pad the SRS to a mesh-divisible length: identity points
        # contribute nothing regardless of the padded scalar tail
        self.m = -(-n_srs // n_dev) * n_dev
        pts = list(pk.srs.g1) + [None] * (self.m - n_srs)
        self._smsm = ShardedMSM(
            get_msm_for("g1", self.m // n_dev), mesh, axis
        )
        self._pts = self._smsm.shard_points(g1_to_device(pts))

    # ---- placement: shard the trailing (domain) axis when divisible ------
    def place(self, x):
        def put(a):
            if a.shape[-1] % self.mesh.shape[self.axis] == 0:
                spec = P(*([None] * (a.ndim - 1) + [self.axis]))
                return jax.device_put(a, NamedSharding(self.mesh, spec))
            return a

        return jax.tree_util.tree_map(put, x)

    # ---- commits ---------------------------------------------------------
    def _pad(self, coeffs):
        return jnp.pad(coeffs, ((0, 0),) * (coeffs.ndim - 1) + ((0, self.m - coeffs.shape[-1]),))

    def commit(self, srs, coeffs_norm):
        from ...curves.encoding import g1_from_device_proj

        raw = self._smsm(self._pts, self._pad(coeffs_norm))
        (out,) = g1_from_device_proj(raw)
        return out

    def commit_many(self, srs, stack_norm):
        from ...curves.encoding import g1_from_device_proj

        raw = self._smsm.many(self._pts, self._pad(stack_norm))
        return g1_from_device_proj(raw)


def _engine_cache(pk: PlonkProvingKey, mesh, axis: str) -> ShardedPlonkEngine:
    cache = pk.__dict__.setdefault("_sharded_engines", {})
    key = (tuple(id(d) for d in mesh.devices.flat), axis)
    entry = cache.get(key)
    if entry is None or entry[1] is not mesh:
        eng = ShardedPlonkEngine(pk, mesh, axis)
        cache[key] = entry = (eng, mesh)
    return entry[0]


def prove_sharded(
    cs: SparseConstraintSystem,
    pk: PlonkProvingKey,
    assignment: dict,
    mesh,
    axis: str = "data",
    rng=None,
    config=None,
) -> PlonkProof:
    """Full multi-chip PLONK prove. Same proof distribution as prove()."""
    eng = _engine_cache(pk, mesh, axis)
    return _prove(cs, pk, assignment, rng=rng, config=config, engine=eng)
