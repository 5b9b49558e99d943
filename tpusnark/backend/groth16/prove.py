"""Groth16 prover: the framework's flagship hot path.

Pipeline shape follows the reference's device-offload prover
(/root/reference/backend/groth16/bn254/icicle/icicle.go:133-422): solve the
witness, compute the quotient polynomial H on the accelerator
(computeH, icicle.go:453-513 — INTT x3, coset-NTT x3, pointwise, coset-INTT),
then 4 MSMs (Ar: G1, Bs1: G1, Krs(K,Z): G1, Bs: G2; prove.go:201-290), and a
handful of host point additions to assemble the proof.

TPU-native differences: no explicit device copies or pointer lifecycle — the
proving key's point tables are device-resident jax arrays (HBM) after the
first prove; NTTs and MSMs are jit-compiled batched limb kernels; XLA
schedules the independent MSMs (the reference hand-rolls goroutine DAGs).
"""

from __future__ import annotations

import secrets

import jax.numpy as jnp
import numpy as np

from ...constraint.eval_jax import ABCEvaluator
from ...constraint.system import ConstraintSystem
from ...curves import ref
from ...curves.encoding import g1_from_device_proj, g2_from_device_proj
from ...curves.jcurve import g1_ops, g2_ops
from ...curves.ref import G1, G2
from ...fields.jfield import get_field
from ...fields.spec import BN254_FP, BN254_FR
from ...msm.pippenger import MSM, get_msm_for
from ...poly.ntt import get_ntt
from .keys import Proof, ProvingKey

_fr = get_field(BN254_FR)
_fp = get_field(BN254_FP)


def _engines(n_points: int):
    return get_msm_for("g1", n_points), get_msm_for("g2", n_points)


def _scalars_dev(vals: list[int]):
    """Normal-form 16-bit limb encoding, (L, N)."""
    return jnp.asarray(_fr.spec.encode(vals, mont=False).T.copy())


def compute_h_dev(A, B, C, n: int, spec=BN254_FR):
    """Quotient H = (A*B - C)/Z_H on device; returns (L, n-1) NORMAL-form
    limbs (MSM scalar format).

    Mirrors icicle computeH (icicle.go:453-513): interpolate A,B,C (INTT),
    evaluate on the shifted coset (coset-NTT), pointwise
    (a*b - c) * (g^n - 1)^-1  [Z_H is constant on the coset], coset-INTT.
    Inputs are (L, n_constraints) Montgomery; padded to n here."""
    p = spec.modulus
    ntt = get_ntt(spec, n)
    den = pow((pow(ntt.domain.coset_shift, n, p) - 1) % p, -1, p)
    f = ntt.field

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

    ca = ntt.ntt_coset(ntt.intt(pad(A)))
    cb = ntt.ntt_coset(ntt.intt(pad(B)))
    cc = ntt.ntt_coset(ntt.intt(pad(C)))
    num = f.sub(f.mul(ca, cb), cc)
    den_c = f.broadcast_const(f.const(den, mont=True), num)
    h = ntt.intt_coset(f.mul(num, den_c))
    # degree(H) = n-2; the top coefficient is zero. MSM wants normal form.
    return f.from_mont(h[:, : n - 1])


def _abc_eval(cs: ConstraintSystem, fr=None) -> ABCEvaluator:
    """Per-CS evaluator cache stored ON the constraint system (keyed by the
    field spec): lifetime is tied to cs, so a GC'd system can never alias a
    new one the way an id()-keyed module dict could (advisor r3/r4)."""
    fr = fr or _fr
    cache = cs.__dict__.setdefault("_abc_eval_cache", {})
    ev = cache.get(fr.spec)
    if ev is None:
        ev = ABCEvaluator(cs, fr)
        cache[fr.spec] = ev
    return ev


def bsb22_prover_state(cs: ConstraintSystem, pk: ProvingKey):
    """BSB22 prover-side hint override (reference prove.go:84-112): returns
    (overrides | None, proof_commitments, private_vals); the lists fill in
    as the solver executes the overridden hints. Shared by the single-chip
    and sharded provers."""
    n_com = len(cs.commitments)
    proof_commitments: list = [None] * n_com
    private_vals: list = [None] * n_com
    if not n_com:
        return None, proof_commitments, private_vals
    from ...constraint.hints import bsb22_placeholder
    from ...curves.marshal import g1_raw
    from ...curves.pedersen import pedersen_commit
    from ...utils.hash_to_field import COMMITMENT_DST, hash_to_field

    def bsb22_real(p_, ins):
        i = int(ins[0])
        rest = ins[1:]
        n_hashed = len(cs.commitments[i].public_and_commitment_committed)
        hashed = rest[:n_hashed]
        committed = [int(v) % p_ for v in rest[n_hashed:]]
        C = pedersen_commit(pk.commitment_keys[i], committed)
        proof_commitments[i] = C
        private_vals[i] = committed
        msg = g1_raw(C) + b"".join(int(v).to_bytes(32, "big") for v in hashed)
        return [hash_to_field(msg, COMMITMENT_DST, p_)[0]]

    return {bsb22_placeholder: bsb22_real}, proof_commitments, private_vals


def prove(
    cs: ConstraintSystem,
    pk: ProvingKey,
    assignment: dict,
    rng=None,
    config=None,
    timings: dict | None = None,
) -> Proof:
    """`timings`: optional dict filled with per-phase wall-clock seconds
    (solve / h / msm / assemble — the same phases the reference logs at
    /root/reference/backend/groth16/bn254/prove.go:319). Timing inserts
    device barriers between phases, so only pass it when benchmarking."""
    import time as _time

    import jax as _jax

    from ...curves.config import get_curve
    from ..config import resolve

    def _mark(name, t0, *sync):
        """Record phase wall-clock; barriers on `sync` arrays when timing."""
        if timings is None:
            return 0.0
        for a in sync:
            _jax.block_until_ready(a)
        t = _time.perf_counter()
        timings[name] = timings.get(name, 0.0) + (t - t0)
        return t

    pcfg = resolve(config, rng)
    cfg = get_curve(getattr(pk, "curve", "bn254") or "bn254")
    fr = get_field(cfg.fr_spec)
    fp = get_field(cfg.fp_spec)
    G1, G2 = cfg.host.G1, cfg.host.G2
    p = cs.modulus
    rand = pcfg.rng or (lambda: secrets.randbelow(p))
    r, s = rand(), rand()

    # BSB22: override the placeholder hint with the real Pedersen commit +
    # hash-to-field challenge (reference prove.go:84-112)
    n_com = len(cs.commitments)
    overrides, proof_commitments, private_vals = bsb22_prover_state(cs, pk)
    if n_com:
        from ...curves.pedersen import pedersen_batch_prove

    # Solve on device for wide level structures, host for serial chains
    # (solve_any's minWorkPerCPU-style heuristic; reference
    # /root/reference/constraint/bn254/solver.go:418-524). The device path
    # keeps W resident: A/B/C come straight from the solver's bulk check and
    # the MSM scalar vector is one on-device from_mont, no host round trip.
    from ...constraint.solver_jax import solve_any

    if pcfg.hint_overrides:
        overrides = {**overrides, **pcfg.hint_overrides}
    t0 = _time.perf_counter()
    w_mont, abc, W = solve_any(
        cs,
        assignment,
        cfg.fr_spec,
        hint_overrides=overrides,
        force_host=pcfg.accelerator == "host",
        logs=pcfg.solver_logs,
    )
    t0 = _mark("solve", t0, w_mont, abc)
    n = pk.domain_n

    def wire_ints(idxs: list[int]) -> list[int]:
        if W is not None:
            return [int(W[i]) for i in idxs]
        cols = w_mont[:, np.asarray(idxs, dtype=np.int32)]
        return fr.to_ints(fr.canon(cols), mont=True)

    pok = None
    if n_com:
        seeds = b"".join(
            int(v).to_bytes(32, "big")
            for v in wire_ints([cm.commitment_index for cm in cs.commitments])
        )
        pok = pedersen_batch_prove(pk.commitment_keys, private_vals, seeds)

    if W is not None:
        w_mont = jnp.asarray(fr.spec.encode(W, mont=True).T.copy())
        A, B, C = _abc_eval(cs, fr)(w_mont)
        w_dev = jnp.asarray(fr.spec.encode(W, mont=False).T.copy())
    else:
        A, B, C = abc
        w_dev = fr.from_mont(w_mont)
    t0 = _mark("encode", t0, w_dev, A)
    h_dev = compute_h_dev(A, B, C, n, cfg.fr_spec)
    t0 = _mark("h", t0, h_dev)

    dev = pk.device()
    msm_g1 = get_msm_for("g1", cs.n_wires, cfg.name)
    msm_g2 = get_msm_for("g2", cs.n_wires, cfg.name)
    k_wires = pk.k_wires
    if k_wires is None and cs.commitments:
        # deserialized pk: the bytes don't carry the wire mapping (nor do
        # gnark's — it lives in the CS); reconstruct it
        from .setup import k_pk_wires_for

        k_wires = k_pk_wires_for(cs)
    if k_wires is not None:
        # committed/commitment wires are excluded from pk.K (their K lives in
        # the Pedersen basis / vk); gather the backing wires explicitly
        priv_dev = w_dev[:, np.asarray(k_wires, dtype=np.int32)]
    else:
        priv_dev = w_dev[:, cs.n_public :]

    ar_raw = msm_g1(dev["a"], w_dev)
    bs1_raw = msm_g1(dev["b1"], w_dev)
    bs2_raw = msm_g2(dev["b2"], w_dev)
    krs_k = msm_g1(dev["k"], priv_dev)
    krs_z_raw = msm_g1(dev["z"], h_dev) if len(pk.z) else None
    t0 = _mark("msm", t0, ar_raw, bs1_raw, bs2_raw, krs_k, krs_z_raw)

    (ar_sum,) = g1_from_device_proj(ar_raw, fp)
    (bs1_sum,) = g1_from_device_proj(bs1_raw, fp)
    if cfg.g2_over_fp:
        (bs2_sum,) = g1_from_device_proj(bs2_raw, fp)
    elif cfg.g2_fp4:
        from ...curves.encoding import g4_from_device_proj

        (bs2_sum,) = g4_from_device_proj(
            bs2_raw, fp, fp4_cls=cfg.host.Fp4, fp2_cls=cfg.host.Fp2
        )
    else:
        (bs2_sum,) = g2_from_device_proj(
            bs2_raw, fp, fp2_cls=cfg.host.Fp2, q=cfg.fp2_q
        )
    (krs_k_sum,) = g1_from_device_proj(krs_k, fp)
    if krs_z_raw is None:
        # degenerate 1-constraint domain: deg(H) < 0, the Z table is empty
        krs_z_sum = None
    else:
        (krs_z_sum,) = g1_from_device_proj(krs_z_raw, fp)

    # host assembly (reference prove.go:295-410): tiny fixed-base muls
    ar = G1.add(G1.add(pk.alpha_g1, ar_sum), G1.mul(pk.delta_g1, r))
    bs = G2.add(G2.add(pk.beta_g2, bs2_sum), G2.mul(pk.delta_g2, s))
    bs1 = G1.add(G1.add(pk.beta_g1, bs1_sum), G1.mul(pk.delta_g1, s))

    krs = G1.add(krs_k_sum, krs_z_sum)
    krs = G1.add(krs, G1.mul(ar, s))
    krs = G1.add(krs, G1.mul(bs1, r))
    krs = G1.add(krs, G1.mul(pk.delta_g1, (-r * s) % p))
    _mark("assemble", t0)
    return Proof(
        ar=ar, krs=krs, bs=bs, commitments=proof_commitments, commitment_pok=pok
    )
