"""KZG polynomial commitments on TPU.

Covers gnark-crypto's kzg surface as used by the reference PLONK backend:
SRS, Commit, Open, BatchOpenSinglePoint, (batch) Verify
(/root/reference/backend/plonk/bn254/prove.go:336,494,646,769,823 and
setup.go:129-138).

TPU-native mapping: Commit = one G1 MSM over the coefficient limbs (the
Pippenger engine); Open = synthetic division by (X - z) expressed as a
log-depth associative scan of affine maps (q_{i-1} = p_i + z*q_i) plus one
MSM; verification pairings stay on host (not perf-critical, SURVEY.md §2.5).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curves.ref import G1, G2, R, pairing_check
from ..fields.jfield import get_field
from ..fields.spec import BN254_FR
from ..msm.pippenger import get_msm_for

_fr = get_field(BN254_FR)


@dataclass
class SRS:
    """Powers-of-tau structured reference string (G1 side + [1, tau] in G2).

    g1: list of affine G1 points [tau^i * G]; g2: (G2, tau*G2).
    Device residency is lazy like the Groth16 ProvingKey."""

    g1: list
    g2: tuple
    _dev: dict = None

    def device(self, size: int | None = None):
        if self._dev is None:
            from ..curves.encoding import g1_to_device

            self._dev = {"g1": g1_to_device(self.g1)}
        return self._dev


def new_srs_unsafe(size: int, tau: int | None = None, use_device: bool = True) -> SRS:
    """Test-only SRS from a known tau (the analog of gnark's
    test/kzg_srs.go unsafe cached SRS)."""
    tau = tau if tau is not None else secrets.randbelow(R - 2) + 2
    powers = []
    t = 1
    for _ in range(size):
        powers.append(t)
        t = t * tau % R

    if use_device and size >= (1 << 10):
        from ..curves.batch_mul import FixedBaseMul, g1_generator_ladder
        from ..curves.encoding import g1_from_device_proj
        from ..curves.jcurve import g1_ops
        from ..fields.spec import BN254_FP

        fp = get_field(BN254_FP)
        mul = FixedBaseMul(g1_ops(fp), _fr)
        table = g1_generator_ladder(fp, mul.n_bits)
        sc = jnp.asarray(_fr.spec.encode(powers, mont=False).T.copy())
        g1 = g1_from_device_proj(mul(table, sc))
    else:
        g1 = [G1.mul(G1.generator(), s) for s in powers]
    g2 = (G2.generator(), G2.mul(G2.generator(), tau))
    return SRS(g1=g1, g2=g2)


# --------------------------------------------------------------------- commit
def commit_dev(srs: SRS, coeffs_norm) -> tuple:
    """coeffs_norm: (L, m) NORMAL-form fr limbs on device, m <= len(srs.g1).
    Returns an affine host point."""
    from ..curves.encoding import g1_from_device_proj, g1_to_device

    m = coeffs_norm.shape[1]
    dev = srs.device()
    pts = dev["g1"]
    npts = pts[2].shape[0]
    assert m <= npts, "polynomial larger than SRS"
    if m < npts:
        pts = jax.tree_util.tree_map(lambda a: a[..., :m], pts)
    raw = get_msm_for("g1", m)(pts, coeffs_norm)
    (out,) = g1_from_device_proj(raw)
    return out


def commit_many_dev(srs: SRS, coeffs_norm_k) -> list:
    """Batched commit: coeffs (L, k, m) NORMAL-form fr limbs over the SRS.
    Returns k affine host points from ONE composite-key MSM (MSM.many):
    k same-SRS commits share one sort/gather/accumulation per window —
    the TPU answer to the reference prover's goroutine-parallel KZG commits
    (/root/reference/backend/plonk/bn254/prove.go:139-169)."""
    from ..curves.encoding import g1_from_device_proj
    from ..msm.pippenger import get_msm_many_for

    k, m = coeffs_norm_k.shape[1], coeffs_norm_k.shape[2]
    dev = srs.device()
    pts = dev["g1"]
    npts = pts[2].shape[0]
    assert m <= npts, "polynomial larger than SRS"
    if m < npts:
        pts = jax.tree_util.tree_map(lambda a: a[..., :m], pts)
    raw = get_msm_many_for("g1", m, k).many(pts, coeffs_norm_k)
    return g1_from_device_proj(raw)


def commit_ints(srs: SRS, coeffs: list[int]) -> tuple:
    """Host-int convenience commit (small polynomials / tests)."""
    if len(coeffs) >= (1 << 8):
        sc = jnp.asarray(_fr.spec.encode(coeffs, mont=False).T.copy())
        return commit_dev(srs, sc)
    acc = None
    for c, pt in zip(coeffs, srs.g1):
        if c % R:
            acc = G1.add(acc, G1.mul(pt, c))
    return acc


# ----------------------------------------------------------------- open / div
def _div_by_linear_host(coeffs: list[int], z: int) -> tuple[list[int], int]:
    """q(X) = (p(X) - p(z)) / (X - z); returns (q coeffs, p(z))."""
    n = len(coeffs)
    q = [0] * (n - 1)
    acc = 0
    for i in range(n - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % R
        q[i - 1] = acc
    pz = (acc * z + coeffs[0]) % R
    return q, pz


def div_by_linear_dev(coeffs_mont, z: int):
    """Device synthetic division: coeffs (L, *batch, n) Montgomery ->
    (q (L, *batch, n-1) Montgomery, p(z) (L, *batch) limbs).
    q_j = sum_{i>j} p_i z^(i-j-1) via an associative scan of affine maps
    f_i(x) = z*x + p_i composed high-to-low (log-depth on device)."""
    f = _fr
    n = coeffs_mont.shape[-1]
    zc = f.broadcast_const(f.const(z, mont=True), coeffs_mont)

    def comb(e1, e2):
        # e = (m, a) repr of f(x) = m*x + a; e2 AFTER e1: f2(f1(x))
        m1, a1 = e1
        m2, a2 = e2
        return f.mul(m1, m2), f.add(f.mul(m2, a1), a2)

    # scan from the top coefficient down: reverse, scan, un-reverse
    rev = coeffs_mont[..., ::-1]
    _ms, accs = jax.lax.associative_scan(comb, (zc, rev), axis=coeffs_mont.ndim - 1)
    # accs[..., k] = Horner value after folding coeffs n-1 .. n-1-k
    # q_{n-2-k} = accs[k] for k in 0..n-2 ; p(z) = accs[n-1]
    q = accs[..., n - 2 :: -1] if n > 1 else accs[..., :0]
    pz_limb = accs[..., n - 1]
    return q, pz_limb


def eval_many_dev(coeffs_mont, z: int) -> list[int]:
    """Evaluate a batch of polynomials at z: coeffs (L, B, m) Montgomery ->
    list of B ints (one Horner scan for the whole batch)."""
    _q, pz = div_by_linear_dev(coeffs_mont, z)
    return _fr.to_ints(pz)


def open_dev(srs: SRS, coeffs_mont, z: int):
    """KZG opening proof at z from Montgomery coeffs on device.
    Returns (claimed_value int, proof point H)."""
    q, pz_limb = div_by_linear_dev(coeffs_mont, z)
    pz = _fr.to_ints(pz_limb.reshape(_fr.n, 1))[0]
    if q.shape[1] == 0:
        return pz, None
    h = commit_dev(srs, _fr.from_mont(q))
    return pz, h


def open_ints(srs: SRS, coeffs: list[int], z: int):
    q, pz = _div_by_linear_host(coeffs, z)
    return pz, commit_ints(srs, q)


# ---------------------------------------------------------------------- verify
def verify_opening(srs: SRS, commitment, z: int, value: int, proof) -> bool:
    """e(C - value*G1 + z*H, G2) == e(H, tau*G2)
    i.e. pairing_check([(C - v*G + z*H, G2), (-H, tau G2)])."""
    lhs = G1.add(commitment, G1.neg(G1.mul(G1.generator(), value)))
    lhs = G1.add(lhs, G1.mul(proof, z)) if proof is not None else lhs
    if proof is None:
        return lhs is None
    return pairing_check([(lhs, srs.g2[0]), (G1.neg(proof), srs.g2[1])])


def batch_verify_multi_points(srs: SRS, entries: list, lam: int | None = None) -> bool:
    """Verify several KZG openings (commitment, point, value, proofH) with
    one 2-pairing check (gnark-crypto kzg.BatchVerifyMultiPoints):
      F  = sum lam^i (C_i - v_i*G + z_i*H_i),  Hf = sum lam^i H_i
      e(F, G2) == e(Hf, tau*G2).

    lam defaults to fresh verifier-local randomness, sampled AFTER the proof
    is fixed — exactly gnark-crypto's discipline. A Fiat-Shamir lam that the
    prover can predict without binding the H_i quotient points is forgeable:
    the prover solves for H2 with H2(z2)=Q(z2)/(lam*(z2-z1)) and passes the
    combined check with false claimed values."""
    if lam is None:
        import secrets

        lam = secrets.randbelow(R - 1) + 1
    F = None
    Hf = None
    ch = 1
    for c, z, v, h in entries:
        t = G1.add(c, G1.neg(G1.mul(G1.generator(), v)))
        if h is not None:
            t = G1.add(t, G1.mul(h, z))
            Hf = G1.add(Hf, G1.mul(h, ch))
        F = G1.add(F, G1.mul(t, ch))
        ch = ch * lam % R
    if Hf is None:
        return F is None
    return pairing_check([(F, srs.g2[0]), (G1.neg(Hf), srs.g2[1])])


def batch_verify_single_point(
    srs: SRS, commitments: list, z: int, values: list[int], proof, fold_challenge: int
) -> bool:
    """Verify a folded opening of several polynomials at one point
    (gnark kzg.BatchVerifySinglePoint shape): fold commitments and claimed
    values with powers of the challenge, then one pairing check."""
    acc_c = None
    acc_v = 0
    ch = 1
    for c, v in zip(commitments, values):
        if c is not None:
            acc_c = G1.add(acc_c, G1.mul(c, ch))
        acc_v = (acc_v + ch * v) % R
        ch = ch * fold_challenge % R
    return verify_opening(srs, acc_c, z, acc_v, proof)
