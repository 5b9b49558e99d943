"""Groth16 trusted setup.

Reference behavior being reproduced (not translated):
/root/reference/backend/groth16/bn254/setup.go:85-482 —
sample toxic waste (alpha, beta, gamma, delta, t), evaluate the per-wire QAP
polynomials A_w(t), B_w(t), C_w(t) by Lagrange accumulation over all R1C rows,
split K into vk (public, /gamma) and pk (private, /delta) parts, Z powers
t^i * Z_H(t)/delta, then one giant batched fixed-base scalar multiplication
for all key points (setup.go:251 BatchScalarMultiplicationG1/G2).

TPU-native: the scalar math is exact python ints on host (one pass over the
constraint terms, O(#terms)); the point generation — the actual hot part —
runs on device via :class:`~tpusnark.curves.batch_mul.FixedBaseMul`
(254 batched complete mixed adds over all scalars at once). Small systems
(< _DEVICE_THRESHOLD scalars) just use the host ladder directly.
"""

from __future__ import annotations

import secrets

from ...constraint.system import ConstraintSystem
from ...curves import ref
from ...curves.ref import G1, G2
from .keys import Proof, ProvingKey, VerifyingKey

_DEVICE_THRESHOLD = 1 << 10


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def lagrange_coeffs_at(t: int, n: int, omega: int, p: int) -> list[int]:
    """L_i(t) for the size-n domain: L_i(t) = omega^i (t^n - 1) / (n (t - omega^i)).

    Assumes t is not in the domain (overwhelming probability for random t)."""
    zt = (pow(t, n, p) - 1) % p
    n_inv = pow(n, -1, p)
    # batch-invert (t - omega^i) via Montgomery trick
    wi = 1
    denoms = []
    for _ in range(n):
        denoms.append((t - wi) % p)
        wi = wi * omega % p
    # prefix products
    pref = [1] * (n + 1)
    for i, d in enumerate(denoms):
        pref[i + 1] = pref[i] * d % p
    inv_all = pow(pref[n], -1, p)
    invs = [0] * n
    for i in range(n - 1, -1, -1):
        invs[i] = inv_all * pref[i] % p
        inv_all = inv_all * denoms[i] % p
    out = [0] * n
    wi = 1
    base = zt * n_inv % p
    for i in range(n):
        out[i] = base * wi % p * invs[i] % p
        wi = wi * omega % p
    return out


def _qap_eval_at_t(cs: ConstraintSystem, t: int, n: int, omega: int):
    """Per-wire A_w(t), B_w(t), C_w(t) via one pass over constraint terms
    (reference: setupABC, setup.go:352)."""
    p = cs.modulus
    L = lagrange_coeffs_at(t, n, omega, p)
    coeffs = cs.coeffs
    nw = cs.n_wires
    A = [0] * nw
    B = [0] * nw
    C = [0] * nw
    for i, c in enumerate(cs.constraints):
        li = L[i]
        for cid, vid in c.L:
            A[vid] = (A[vid] + coeffs[cid] * li) % p
        for cid, vid in c.R:
            B[vid] = (B[vid] + coeffs[cid] * li) % p
        for cid, vid in c.O:
            C[vid] = (C[vid] + coeffs[cid] * li) % p
    return A, B, C


def _g1_many(scalars: list[int], use_device: bool, curve: str = "bn254"):
    """[s_i * G1] for all i; device batch path for large inputs."""
    from ...curves.config import get_curve

    cfg = get_curve(curve)
    G1h = cfg.host.G1
    if not use_device or len(scalars) < _DEVICE_THRESHOLD:
        return [
            G1h.mul(G1h.generator(), s) if s % cfg.host.R else None for s in scalars
        ]
    from ...curves.batch_mul import FixedBaseMul, g1_generator_ladder
    from ...curves.encoding import g1_from_device_proj
    from ...curves.jcurve import g1_ops
    from ...fields.jfield import get_field

    fp = get_field(cfg.fp_spec)
    fr = get_field(cfg.fr_spec)
    mul = FixedBaseMul(g1_ops(fp, b=cfg.g1_b), fr)
    table = g1_generator_ladder(fp, mul.n_bits, curve)
    import jax.numpy as jnp

    sc = jnp.asarray(fr.spec.encode(scalars, mont=False).T.copy())
    return g1_from_device_proj(mul(table, sc), fp)


def _g2_many(scalars: list[int], use_device: bool, curve: str = "bn254"):
    from ...curves.config import get_curve

    cfg = get_curve(curve)
    G2h = cfg.host.G2
    if not use_device or len(scalars) < _DEVICE_THRESHOLD or cfg.g2_fp4:
        # BLS24 (g2_fp4): host ladder — the device fixed-base path has no
        # Fp4 generator-ladder builder yet (G2 setup size is one point per
        # wire; acceptable for the supported circuit sizes on these curves)
        return [
            G2h.mul(G2h.generator(), s) if s % cfg.host.R else None for s in scalars
        ]
    from ...curves.batch_mul import FixedBaseMul, g2_generator_ladder
    from ...curves.encoding import g1_from_device_proj, g2_from_device_proj
    from ...curves.jcurve import g1_ops, g2_ops
    from ...fields.jfield import get_field

    fp = get_field(cfg.fp_spec)
    fr = get_field(cfg.fr_spec)
    ops = (
        g1_ops(fp, b=cfg.g2_b)
        if cfg.g2_over_fp
        else g2_ops(fp, b3=cfg.g2_b3, q=cfg.fp2_q)
    )
    mul = FixedBaseMul(ops, fr)
    table = g2_generator_ladder(fp, mul.n_bits, curve)
    import jax.numpy as jnp

    sc = jnp.asarray(fr.spec.encode(scalars, mont=False).T.copy())
    raw = mul(table, sc)
    if cfg.g2_over_fp:
        return g1_from_device_proj(raw, fp)
    return g2_from_device_proj(raw, fp, fp2_cls=cfg.host.Fp2, q=cfg.fp2_q)


def k_pk_wires_for(cs: ConstraintSystem) -> list[int]:
    """Wire ids backing pk.K: private wires minus BSB22 commitment wires and
    committed wires (whose K points live in the Pedersen basis / vk instead;
    reference setup.go:163-197). Identity order. Used by setup, and by prove
    to reconstruct the mapping for a deserialized pk (gnark keeps this info
    in the CS, not the pk bytes)."""
    cw_set = {c.commitment_index for c in cs.commitments}
    committed = {w for cm in cs.commitments for w in cm.private_committed}
    return [
        w
        for w in range(cs.n_public, cs.n_wires)
        if w not in cw_set and w not in committed
    ]


def dummy_setup(cs: ConstraintSystem, use_device: bool = True):
    """ProvingKey with the right shapes but meaningless values — for
    benchmarking the prover without a trusted setup (reference DummySetup,
    /root/reference/backend/groth16/bn254/setup.go:482). Proofs made with it
    do NOT verify."""
    rng_state = __import__("random").Random(0xD00D)
    pk, _vk = setup(cs, rng=lambda: rng_state.randrange(1, ref.R), use_device=use_device)
    return pk


def setup(cs: ConstraintSystem, rng=None, use_device: bool = True, curve: str = "bn254"):
    """(pk, vk) for an R1CS over the given curve (one parametrized
    implementation — the reference generates this per curve,
    /root/reference/backend/backend.go:28-33 + internal/generator). rng:
    callable -> int in [1, r) for testing determinism; defaults to
    secrets-based sampling."""
    from ...curves.config import get_curve

    cfg = get_curve(curve)
    assert cs.modulus == cfg.host.R, f"circuit modulus is not {curve}'s r"
    if cs.commitments and curve != "bn254":
        raise NotImplementedError("BSB22 commitments are BN254-only for now")
    p = cfg.host.R
    rand = rng or (lambda: secrets.randbelow(p - 1) + 1)

    from ...poly.domain import Domain

    n = _next_pow2(max(1, len(cs.constraints)))
    dom = Domain(cfg.fr_spec, n)

    alpha, beta, gamma, delta, t = (rand() for _ in range(5))
    # resample t until Z_H(t) != 0
    while pow(t, n, p) == 1:
        t = rand()

    A, B, C = _qap_eval_at_t(cs, t, n, dom.generator)

    gamma_inv = pow(gamma, -1, p)
    delta_inv = pow(delta, -1, p)
    npub = cs.n_public

    # BSB22 commitment-aware K split (reference setup.go:100-197): the
    # commitment wires are verifier-injected so their K goes to vk (gammaInv);
    # committed private wires' K become the Pedersen commitment basis
    # (gammaInv); everything else private goes to pk.K (deltaInv).
    commitment_wires = [c.commitment_index for c in cs.commitments]
    cw_set = set(commitment_wires)
    committed_of: dict[int, int] = {}  # private committed wire -> commitment idx
    for j, cm in enumerate(cs.commitments):
        for w in cm.private_committed:
            committed_of[w] = j

    def k_at(w, coeff):
        return (beta * A[w] + alpha * B[w] + C[w]) * coeff % p

    k_vk_s = [k_at(w, gamma_inv) for w in range(npub)]
    k_vk_s += [k_at(w, gamma_inv) for w in sorted(cw_set)]
    ck_s = [[k_at(w, gamma_inv) for w in cm.private_committed] for cm in cs.commitments]
    k_pk_wires = k_pk_wires_for(cs)
    k_pk_s = [k_at(w, delta_inv) for w in k_pk_wires]
    zt = (pow(t, n, p) - 1) % p
    z_s = []
    ti = 1
    for _ in range(n - 1):
        z_s.append(zt * delta_inv % p * ti % p)
        ti = ti * t % p

    # one big G1 batch: [A | B | K_vk | K_pk | CK... | Z | alpha, beta, delta]
    ck_flat = [s for lst in ck_s for s in lst]
    g1_scalars = A + B + k_vk_s + k_pk_s + ck_flat + z_s + [alpha, beta, delta]
    g1_pts = _g1_many(g1_scalars, use_device, curve)
    o = 0
    nw = cs.n_wires
    a_pts = g1_pts[o : o + nw]
    o += nw
    b1_pts = g1_pts[o : o + nw]
    o += nw
    k_vk = g1_pts[o : o + len(k_vk_s)]
    o += len(k_vk_s)
    k_pk = g1_pts[o : o + len(k_pk_s)]
    o += len(k_pk_s)
    ck_bases = []
    for lst in ck_s:
        ck_bases.append(g1_pts[o : o + len(lst)])
        o += len(lst)
    z_pts = g1_pts[o : o + n - 1]
    o += n - 1
    alpha_g1, beta_g1, delta_g1 = g1_pts[o : o + 3]

    commitment_keys, commitment_vk = [], None
    if cs.commitments:
        from ...curves.pedersen import pedersen_setup

        commitment_keys, commitment_vk = pedersen_setup(ck_bases, rand)

    g2_pts = _g2_many(B + [beta, gamma, delta], use_device, curve)
    b2_pts = g2_pts[:nw]
    beta_g2, gamma_g2, delta_g2 = g2_pts[nw : nw + 3]

    # verifier-side committed-public index lists: wire ids of committed
    # publics stay as positions into [1 | publics]; committed commitment
    # wires translate to npub + (ordinal of that commitment), matching the
    # extended public witness the verifier builds
    # (reference GetPublicAndCommitmentCommitted, constraint/commitment.go:53).
    cw_sorted = sorted(cw_set)
    cw_pos = {w: npub + i for i, w in enumerate(cw_sorted)}
    pub_committed = [
        [cw_pos.get(w, w) for w in cm.public_and_commitment_committed]
        for cm in cs.commitments
    ]

    pk = ProvingKey(
        alpha_g1=alpha_g1,
        beta_g1=beta_g1,
        delta_g1=delta_g1,
        beta_g2=beta_g2,
        delta_g2=delta_g2,
        a=a_pts,
        b1=b1_pts,
        b2=b2_pts,
        k=k_pk,
        z=z_pts,
        domain_n=n,
        k_wires=k_pk_wires,
        commitment_keys=commitment_keys,
        curve=curve,
    )
    vk = VerifyingKey(
        alpha_g1=alpha_g1,
        beta_g2=beta_g2,
        gamma_g2=gamma_g2,
        delta_g2=delta_g2,
        k=k_vk,
        beta_g1=beta_g1,
        delta_g1=delta_g1,
        commitment_key=commitment_vk,
        public_and_commitment_committed=pub_committed,
    )
    return pk, vk
