"""PLONK prover: the reference's 11-stage dataflow DAG
(/root/reference/backend/plonk/bn254/prove.go:116-1079) re-expressed as a
sequence of jit-compiled device programs (XLA schedules; no goroutine DAG):

  solve -> commit blinded L,R,O -> FS gamma,beta -> grand product Z
  (device prefix scan + one batched Fermat inversion, replacing
  iop.BuildRatioCopyConstraint prove.go:600) -> FS alpha -> quotient on the
  4n coset (the rho-loop computeNumerator prove.go:837-1079 becomes
  pointwise device algebra over precomputed coset tables) -> FS zeta ->
  batched evaluations (one Horner scan) -> one folded KZG opening at zeta
  + one at omega*zeta.

All polynomial data is (n_limbs, ...) Montgomery device arrays; host work
is witness solving and transcript hashing.
"""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp

from ...constraint.scs import SparseConstraintSystem, solve_scs
from ...fields.jfield import get_field
from ...fields.spec import BN254_FR
from ...poly import kzg
from ...poly.ntt import get_ntt
from ...utils.transcript import Transcript, fr_bytes, g1_bytes
from .keys import PlonkProof, PlonkProvingKey

_fr = get_field(BN254_FR)

# fold order for the batched opening at zeta (verifier must match)
FOLD_ORDER = (
    "l", "r", "o", "z",
    "s1", "s2", "s3",
    "ql", "qr", "qm", "qo", "qc",
    "h1", "h2", "h3",
)

CHALLENGES = ("gamma", "beta", "alpha", "zeta", "v")


def _blind(coeffs, blinders: list[int], n: int):
    """coeffs (L, m) + Z_H(X) * sum b_i X^i  (Z_H = X^n - 1).
    Returns (L, n + len(blinders)) array."""
    f = _fr
    nb = len(blinders)
    out = jnp.pad(coeffs, ((0, 0), (0, n + nb - coeffs.shape[1])))
    for i, b in enumerate(blinders):
        bc = f.const(b, mont=True)
        out = out.at[:, n + i].set(f.add(out[:, n + i], bc))
        out = out.at[:, i].set(f.sub(out[:, i], bc))
    return out


def _prefix_mul(x):
    """Inclusive prefix product along the last axis (field mul)."""
    return jax.lax.associative_scan(_fr.mul, x, axis=x.ndim - 1)


def prove(
    cs: SparseConstraintSystem,
    pk: PlonkProvingKey,
    assignment: dict,
    rng=None,
) -> PlonkProof:
    f = _fr
    p = cs.modulus
    n = pk.domain_n
    vk = pk.vk
    rand = rng or (lambda: secrets.randbelow(p))
    ntt_n = get_ntt(BN254_FR, n)
    ntt_4n = get_ntt(BN254_FR, 4 * n)

    # ---- 1. solve + wire columns -------------------------------------------
    W = solve_scs(cs, assignment)
    pubs = W[: cs.n_public]
    pad = n - cs.n_gates
    l_e = [W[g.xa] for g in cs.gates] + [0] * pad
    r_e = [W[g.xb] for g in cs.gates] + [0] * pad
    o_e = [W[g.xc] for g in cs.gates] + [0] * pad
    lro = f.array(l_e + r_e + o_e).reshape(f.n, 3, n)
    lro_c = ntt_n.intt(lro)  # (L, 3, n) coefficient forms

    l_hat = _blind(lro_c[:, 0], [rand(), rand()], n)
    r_hat = _blind(lro_c[:, 1], [rand(), rand()], n)
    o_hat = _blind(lro_c[:, 2], [rand(), rand()], n)

    l_com = kzg.commit_dev(pk.srs, f.from_mont(l_hat))
    r_com = kzg.commit_dev(pk.srs, f.from_mont(r_hat))
    o_com = kzg.commit_dev(pk.srs, f.from_mont(o_hat))

    # ---- 2. gamma, beta ------------------------------------------------------
    tr = Transcript(list(CHALLENGES))
    for pt in vk.digest_points():
        tr.bind("gamma", g1_bytes(pt))
    for w in pubs:
        tr.bind("gamma", fr_bytes(w))
    for c in (l_com, r_com, o_com):
        tr.bind("gamma", g1_bytes(c))
    gamma = tr.challenge_int("gamma", p)
    beta = tr.challenge_int("beta", p)

    # ---- 3. grand product Z --------------------------------------------------
    gb = f.broadcast_const(f.const(gamma, mont=True), lro[:, 0])
    bb = f.const(beta, mont=True)

    def lin(col, tbl):
        # col + beta*tbl + gamma  (all (L, n) Montgomery)
        return f.add(f.add(col, f.mul(f.broadcast_const(bb, tbl), tbl)), gb)

    id1 = f.array(ntt_n.domain.powers)  # omega^i
    id2 = f.mul_const(id1, vk.k1)
    id3 = f.mul_const(id1, vk.k2)
    s1_t = f.array(pk.s_evals_int["s1"])
    s2_t = f.array(pk.s_evals_int["s2"])
    s3_t = f.array(pk.s_evals_int["s3"])
    num = f.mul(f.mul(lin(lro[:, 0], id1), lin(lro[:, 1], id2)), lin(lro[:, 2], id3))
    den = f.mul(f.mul(lin(lro[:, 0], s1_t), lin(lro[:, 1], s2_t)), lin(lro[:, 2], s3_t))
    pnum = _prefix_mul(num)
    pden = _prefix_mul(den)
    zfull = f.mul(pnum, f.inv(pden))  # zfull[j] = prod_{i<=j} num/den
    one_col = f.broadcast_const(f.one, zfull[:, :1])
    z_evals = jnp.concatenate([one_col, zfull[:, : n - 1]], axis=1)
    z_c = ntt_n.intt(z_evals)
    z_hat = _blind(z_c, [rand(), rand(), rand()], n)
    z_com = kzg.commit_dev(pk.srs, f.from_mont(z_hat))

    tr.bind("alpha", g1_bytes(z_com))
    alpha = tr.challenge_int("alpha", p)

    # ---- 4. quotient t on the 4n coset --------------------------------------
    def coset4(coeffs):
        return ntt_4n.ntt_coset(
            jnp.pad(coeffs, ((0, 0), (0, 4 * n - coeffs.shape[1])))
        )

    lc = coset4(l_hat)
    rc = coset4(r_hat)
    oc = coset4(o_hat)
    zc = coset4(z_hat)
    # z(omega X): scale coeff i by omega^i
    wpow = f.array([pow(vk.generator, i, p) for i in range(z_hat.shape[1])])
    zwc = coset4(f.mul(z_hat, wpow))
    # public-input polynomial on the coset
    pi_evals = pubs + [0] * (n - len(pubs))
    pic = coset4(ntt_n.intt(f.array(pi_evals)))

    q = pk.q_coset
    s = pk.s_coset
    idt = pk.id_coset
    gate = f.add(
        f.add(f.mul(q["ql"], lc), f.mul(q["qr"], rc)),
        f.add(f.mul(q["qm"], f.mul(lc, rc)), f.add(f.mul(q["qo"], oc), q["qc"])),
    )
    gate = f.add(gate, pic)

    gb4 = f.broadcast_const(f.const(gamma, mont=True), lc)

    def lin4(col, tbl):
        return f.add(f.add(col, f.mul(f.broadcast_const(bb, tbl), tbl)), gb4)

    perm_num = f.mul(
        f.mul(f.mul(lin4(lc, idt["id1"]), lin4(rc, idt["id2"])), lin4(oc, idt["id3"])),
        zc,
    )
    perm_den = f.mul(
        f.mul(f.mul(lin4(lc, s["s1"]), lin4(rc, s["s2"])), lin4(oc, s["s3"])), zwc
    )
    perm = f.sub(perm_num, perm_den)
    l1_term = f.mul(pk.l1_coset, f.sub(zc, f.broadcast_const(f.one, zc)))

    a1 = f.const(alpha, mont=True)
    a2 = f.const(alpha * alpha % p, mont=True)
    numer = f.add(
        gate,
        f.add(
            f.mul(f.broadcast_const(a1, perm), perm),
            f.mul(f.broadcast_const(a2, l1_term), l1_term),
        ),
    )
    t_c = ntt_4n.intt_coset(f.mul(numer, pk.zh_inv_coset))  # (L, 4n)
    m = n + 2
    h1 = t_c[:, :m]
    h2 = t_c[:, m : 2 * m]
    h3 = t_c[:, 2 * m : 3 * m]
    h1_com = kzg.commit_dev(pk.srs, f.from_mont(h1))
    h2_com = kzg.commit_dev(pk.srs, f.from_mont(h2))
    h3_com = kzg.commit_dev(pk.srs, f.from_mont(h3))

    for c in (h1_com, h2_com, h3_com):
        tr.bind("zeta", g1_bytes(c))
    zeta = tr.challenge_int("zeta", p)

    # ---- 5. evaluations at zeta (one batched Horner scan) --------------------
    polys = {
        "l": l_hat,
        "r": r_hat,
        "o": o_hat,
        "z": z_hat,
        "s1": pk.s_coeffs["s1"],
        "s2": pk.s_coeffs["s2"],
        "s3": pk.s_coeffs["s3"],
        "ql": pk.q_coeffs["ql"],
        "qr": pk.q_coeffs["qr"],
        "qm": pk.q_coeffs["qm"],
        "qo": pk.q_coeffs["qo"],
        "qc": pk.q_coeffs["qc"],
        "h1": h1,
        "h2": h2,
        "h3": h3,
    }
    maxm = max(v.shape[1] for v in polys.values())
    stack = jnp.stack(
        [jnp.pad(polys[k], ((0, 0), (0, maxm - polys[k].shape[1]))) for k in FOLD_ORDER],
        axis=1,
    )  # (L, K, maxm)
    vals = kzg.eval_many_dev(stack, zeta)
    evals = {k: v for k, v in zip(FOLD_ORDER, vals)}
    omega_zeta = zeta * vk.generator % p
    z_omega_zeta = kzg.eval_many_dev(z_hat.reshape(f.n, 1, -1), omega_zeta)[0]

    # ---- 6. fold + open -------------------------------------------------------
    for k in FOLD_ORDER:
        tr.bind("v", fr_bytes(evals[k]))
    tr.bind("v", fr_bytes(z_omega_zeta))
    v = tr.challenge_int("v", p)

    vpows = [pow(v, i, p) for i in range(len(FOLD_ORDER))]
    vp = f.array(vpows).reshape(f.n, len(FOLD_ORDER), 1)
    folded = f.sum(f.mul(stack, vp), axis=1)  # (L, maxm)
    q_poly, _ = kzg.div_by_linear_dev(folded, zeta)
    w_zeta = kzg.commit_dev(pk.srs, f.from_mont(q_poly))
    q2, _ = kzg.div_by_linear_dev(z_hat, omega_zeta)
    w_omega_zeta = kzg.commit_dev(pk.srs, f.from_mont(q2))

    return PlonkProof(
        l_com=l_com,
        r_com=r_com,
        o_com=o_com,
        z_com=z_com,
        h1_com=h1_com,
        h2_com=h2_com,
        h3_com=h3_com,
        evals=evals,
        z_omega_zeta=z_omega_zeta,
        w_zeta=w_zeta,
        w_omega_zeta=w_omega_zeta,
    )
