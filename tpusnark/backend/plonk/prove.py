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
from ...poly.iop import Basis, Layout, Polynomial
from ...poly.ntt import get_ntt
from ...utils.transcript import Transcript, fr_bytes, g1_bytes, kzg_fold_challenge
from .keys import PlonkProof, PlonkProvingKey

_fr = get_field(BN254_FR)

# batched-opening order at zeta (gnark batchOpening, prove.go:777-836:
# [foldedH, linearizedPolynomial, l, r, o, s1, s2]); verifier must match
FOLD_ORDER = ("folded_h", "lin", "l", "r", "o", "s1", "s2")

# gnark's main transcript registers exactly these four (prove.go:243); the
# KZG batch-opening fold challenge lives in its own fresh transcript
# (utils.transcript.kzg_fold_challenge), NOT here.
CHALLENGES = ("gamma", "beta", "alpha", "zeta")


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


# --- jitted device regions -------------------------------------------------
# Over the remote-compile tunnel every eager op costs ~5-30 ms of dispatch;
# the prover's array pipeline is hundreds of small ops, so wall-clock was
# dispatch-bound (72 s for a 2^8 circuit). Grouping the two hottest regions
# (grand product, quotient slices) into single jit programs turns each into
# ONE dispatch; challenge scalars enter as (L,) Montgomery arrays so one
# compiled program serves every proof of the same shape.


@jax.jit
def _grand_z_j(lro, id1, id2, id3, s1_t, s2_t, s3_t, gamma_m, beta_m):
    """Grand-product Z evaluations (iop.BuildRatioCopyConstraint analog,
    reference prove.go:600): prefix products + one batched inversion."""
    f = _fr
    n = lro.shape[-1]
    gb = f.broadcast_const(gamma_m, lro[:, 0])

    def lin(col, tbl):
        return f.add(f.add(col, f.mul(f.broadcast_const(beta_m, tbl), tbl)), gb)

    num = f.mul(f.mul(lin(lro[:, 0], id1), lin(lro[:, 1], id2)), lin(lro[:, 2], id3))
    den = f.mul(f.mul(lin(lro[:, 0], s1_t), lin(lro[:, 1], s2_t)), lin(lro[:, 2], s3_t))
    pnum = _prefix_mul(num)
    pden = _prefix_mul(den)
    zfull = f.mul(pnum, f.inv(pden))
    one_col = f.broadcast_const(f.one, zfull[:, :1])
    return jnp.concatenate([one_col, zfull[:, : n - 1]], axis=1)


_slice_jit: dict = {}


def _get_slice_jit(n: int):
    """Jitted quotient-numerator slice evaluator for domain size n (the
    rho-loop body, computeNumerator prove.go:980-1045): one dispatch per
    coset slice instead of ~60."""
    fn = _slice_jit.get(n)
    if fn is not None:
        return fn
    ntt_n = get_ntt(BN254_FR, n)
    f = _fr
    # regime dispatch: n >= FOUR_STEP_MIN has no _bitrev/packed table and
    # _fwd_tables() returns the four-step 3-tuple — _ntt_run would crash
    run = ntt_n._ntt4_run if n >= ntt_n.FOUR_STEP_MIN else ntt_n._ntt_run

    def impl(polys, qs, ss, qcps, ccs, sc, omega_pows, tw, C):
        def eval_slice(coeffs):
            m = coeffs.shape[1]
            base = coeffs[:, :n]
            if m > n:
                tail = jnp.pad(coeffs[:, n:], ((0, 0), (0, n - (m - n))))
                base = f.add(base, f.mul(f.broadcast_const(C["xn"], tail), tail))
            return run(f.mul(base, sc), tw)

        lc = eval_slice(polys["l"])
        rc = eval_slice(polys["r"])
        oc = eval_slice(polys["o"])
        zc = eval_slice(polys["z"])
        zwc = eval_slice(polys["zw"])
        pic = eval_slice(polys["pi"])
        q = {k: eval_slice(v) for k, v in qs.items()}
        s = {k: eval_slice(v) for k, v in ss.items()}
        id1 = f.mul(f.broadcast_const(C["s_r"], omega_pows), omega_pows)
        id2 = f.mul(f.broadcast_const(C["s_r_k1"], omega_pows), omega_pows)
        id3 = f.mul(f.broadcast_const(C["s_r_k2"], omega_pows), omega_pows)
        # L1 = (x^n - 1)/(n (x - 1)): coefficients are all 1/n
        l1 = f.mul(f.broadcast_const(C["n_inv"], sc), run(sc, tw))

        gate = f.add(
            f.add(f.mul(q["ql"], lc), f.mul(q["qr"], rc)),
            f.add(f.mul(q["qm"], f.mul(lc, rc)), f.add(f.mul(q["qo"], oc), q["qc"])),
        )
        gate = f.add(gate, pic)
        for qcp_c, cc in zip(qcps, ccs):
            gate = f.add(gate, f.mul(eval_slice(qcp_c), eval_slice(cc)))

        gb4 = f.broadcast_const(C["gamma"], lc)

        def lin4(col, tbl):
            return f.add(
                f.add(col, f.mul(f.broadcast_const(C["beta"], tbl), tbl)), gb4
            )

        perm_zw = f.mul(
            f.mul(f.mul(lin4(lc, s["s1"]), lin4(rc, s["s2"])), lin4(oc, s["s3"])), zwc
        )
        perm_z = f.mul(f.mul(f.mul(lin4(lc, id1), lin4(rc, id2)), lin4(oc, id3)), zc)
        perm = f.sub(perm_zw, perm_z)
        l1_term = f.mul(l1, f.sub(zc, f.broadcast_const(f.one, zc)))
        numer = f.add(
            gate,
            f.add(
                f.mul(f.broadcast_const(C["a1"], perm), perm),
                f.mul(f.broadcast_const(C["a2"], l1_term), l1_term),
            ),
        )
        return f.mul(numer, f.broadcast_const(C["zh_inv"], numer))

    fn = jax.jit(impl)
    _slice_jit[n] = fn
    return fn


def prove(
    cs: SparseConstraintSystem,
    pk: PlonkProvingKey,
    assignment: dict,
    rng=None,
    config=None,
    timings: dict | None = None,
) -> PlonkProof:
    """`timings`: optional per-phase wall-clock dict (solve / lro / z /
    quotient / open — the reference logs the whole-prover scope at
    backend/plonk/bn254/prove.go:175). Adds device barriers; benchmarking
    only."""
    import time as _time

    from ..config import resolve

    def _mark(name, t0, *sync):
        if timings is None:
            return 0.0
        for a in sync:
            jax.block_until_ready(a)
        t = _time.perf_counter()
        timings[name] = timings.get(name, 0.0) + (t - t0)
        return t

    pcfg = resolve(config, rng)
    f = _fr
    p = cs.modulus
    n = pk.domain_n
    vk = pk.vk
    rand = pcfg.rng or (lambda: secrets.randbelow(p))
    ntt_n = get_ntt(BN254_FR, n)
    ntt_4n = get_ntt(BN254_FR, 4 * n)

    # ---- 0. BSB22 commitments: the prover-side hint override computes the
    # REAL committed polynomial P_i (values at committed rows + blinding at
    # two qcp=0 rows), KZG-commits it, and derives the challenge by
    # hash-to-field of the commitment bytes (reference bsb22Hint,
    # prove.go:316-352; DST "BSB22-Plonk", backend.go:231-233) ----------------
    n_com = len(cs.commitments)
    bsb22_points: list = [None] * n_com
    bsb22_vals: list = [0] * n_com
    c_coeffs: list = [None] * n_com  # canonical coefficient forms of P_i
    overrides = None
    if n_com:
        from ...constraint.hints import bsb22_placeholder
        from ...curves.marshal import g1_raw
        from ...utils.hash_to_field import hash_to_field

        def bsb22_real(pm, ins):
            depth = int(ins[0])
            cm = cs.commitments[depth]
            vals = [int(v) % p for v in ins[1:]]
            evals = [0] * n
            for r, v in zip(cm.committed, vals):
                evals[cs.n_public + r] = v
            # blinding at two qcp=0 rows: the commitment-injection row and
            # the last constraint row (prove.go:329-334)
            evals[cs.n_public + cm.commitment_index] = rand()
            evals[cs.n_gates - 1] = rand()
            coeffs = ntt_n.intt(f.array(evals))
            c_coeffs[depth] = coeffs
            pt = kzg.commit_dev(pk.srs, f.from_mont(coeffs))
            bsb22_points[depth] = pt
            (ch,) = hash_to_field(g1_raw(pt), b"BSB22-Plonk", p)
            bsb22_vals[depth] = ch
            return [ch]

        overrides = {bsb22_placeholder: bsb22_real}

    # ---- 1. solve + wire columns -------------------------------------------
    if pcfg.hint_overrides:
        overrides = {**(overrides or {}), **pcfg.hint_overrides}
    t0 = _time.perf_counter()
    W = solve_scs(cs, assignment, hint_overrides=overrides, logs=pcfg.solver_logs)
    t0 = _mark("solve", t0)
    pubs = W[: cs.n_public]
    pad = n - cs.n_gates
    l_e = [W[g.xa] for g in cs.gates] + [0] * pad
    r_e = [W[g.xb] for g in cs.gates] + [0] * pad
    o_e = [W[g.xc] for g in cs.gates] + [0] * pad
    lro = f.array(l_e + r_e + o_e).reshape(f.n, 3, n)
    lro_c = ntt_n.intt(lro)  # (L, 3, n) coefficient forms
    # typed views (iop.Polynomial, the gnark-crypto iop analog): basis
    # bookkeeping is explicit from here on — blinding takes CANONICAL in,
    # commits assert CANONICAL (poly degree n+1 after blinding, so the
    # wrapper types the pre-blind column)
    l_c = Polynomial(lro_c[:, 0], Basis.CANONICAL, Layout.REGULAR, BN254_FR)
    r_c = Polynomial(lro_c[:, 1], Basis.CANONICAL, Layout.REGULAR, BN254_FR)
    o_c = Polynomial(lro_c[:, 2], Basis.CANONICAL, Layout.REGULAR, BN254_FR)

    l_hat = _blind(l_c.data, [rand(), rand()], n)
    r_hat = _blind(r_c.data, [rand(), rand()], n)
    o_hat = _blind(o_c.data, [rand(), rand()], n)

    l_com = kzg.commit_dev(pk.srs, f.from_mont(l_hat))
    r_com = kzg.commit_dev(pk.srs, f.from_mont(r_hat))
    o_com = kzg.commit_dev(pk.srs, f.from_mont(o_hat))
    t0 = _mark("lro", t0)

    # ---- 2. gamma, beta ------------------------------------------------------
    tr = Transcript(list(CHALLENGES), hash_factory=pcfg.challenge_hash)
    for pt in vk.digest_points():
        tr.bind("gamma", g1_bytes(pt))
    for w in pubs:
        tr.bind("gamma", fr_bytes(w))
    for c in (l_com, r_com, o_com):
        tr.bind("gamma", g1_bytes(c))
    gamma = tr.challenge_int("gamma", p)
    beta = tr.challenge_int("beta", p)

    # ---- 3. grand product Z (one jitted dispatch) ---------------------------
    bb = f.const(beta, mont=True)
    id1 = f.array(ntt_n.domain.powers)  # omega^i
    id2 = f.mul_const(id1, vk.k1)
    id3 = f.mul_const(id1, vk.k2)
    s1_t = f.array(pk.s_evals_int["s1"])
    s2_t = f.array(pk.s_evals_int["s2"])
    s3_t = f.array(pk.s_evals_int["s3"])
    z_evals = _grand_z_j(
        lro, id1, id2, id3, s1_t, s2_t, s3_t, f.const(gamma, mont=True), bb
    )
    z_p = Polynomial(z_evals, Basis.LAGRANGE, Layout.REGULAR, BN254_FR)
    z_c = z_p.to_canonical().data
    z_hat = _blind(z_c, [rand(), rand(), rand()], n)
    z_com = kzg.commit_dev(pk.srs, f.from_mont(z_hat))
    t0 = _mark("z", t0)

    # deriveAlpha binds the Bsb22 commitments FIRST, then Z (prove.go:504-512)
    for pt in bsb22_points:
        tr.bind("alpha", g1_bytes(pt))
    tr.bind("alpha", g1_bytes(z_com))
    alpha = tr.challenge_int("alpha", p)

    # ---- 4. quotient t via the rho-loop (gnark computeNumerator,
    # prove.go:980-1045): evaluate the numerator one size-n coset slice at a
    # time — slice r covers the 4n-coset points with index j == r (mod 4),
    # i.e. the coset (shift*w4^r)*H. Peak memory is O(n) per slice (plus the
    # single (L, 4n) result), never O(4n x columns) ---------------------------
    # z(omega X): scale coeff i by omega^i (slice-independent)
    wpow = f.array([pow(vk.generator, i, p) for i in range(z_hat.shape[1])])
    zw_hat = f.mul(z_hat, wpow)
    # public-input polynomial; the prover completes it with the BSB22
    # challenge at each commitment-injection row (qk completion,
    # reference prove.go:415-416)
    pi_evals = pubs + [0] * (n - len(pubs))
    for i, cm in enumerate(cs.commitments):
        pi_evals[cs.n_public + cm.commitment_index] = bsb22_vals[i]
    pi_hat = (
        Polynomial.from_ints(pi_evals, BN254_FR, basis=Basis.LAGRANGE)
        .to_canonical()
        .data
    )

    a1 = f.const(alpha, mont=True)
    a2 = f.const(alpha * alpha % p, mont=True)
    n_inv_m = f.const(pow(n, -1, p), mont=True)
    slice_fn = _get_slice_jit(n)
    polys = {"l": l_hat, "r": r_hat, "o": o_hat, "z": z_hat, "zw": zw_hat, "pi": pi_hat}
    tw_n = ntt_n._fwd_tables()

    def numerator_slice(r: int):
        xn = pk.slice_xn[r]  # x^n on this slice (constant)
        s_r = pk.slice_shift[r]
        C = {
            "xn": f.const(xn, mont=True),
            "zh_inv": f.const(pow((xn - 1) % p, -1, p), mont=True),
            "s_r": f.const(s_r, mont=True),
            "s_r_k1": f.const(s_r * vk.k1 % p, mont=True),
            "s_r_k2": f.const(s_r * vk.k2 % p, mont=True),
            "gamma": f.const(gamma, mont=True),
            "beta": bb,
            "a1": a1,
            "a2": a2,
            "n_inv": n_inv_m,
        }
        return slice_fn(
            polys,
            pk.q_coeffs,
            pk.s_coeffs,
            tuple(pk.qcp_coeffs),
            tuple(c_coeffs),
            pk.coset_scale[r],
            pk.omega_pows,
            tw_n,
            C,
        )

    t_evals = jnp.zeros((f.n, 4 * n), dtype=jnp.uint32)
    for r in range(4):
        t_evals = t_evals.at[:, r::4].set(numerator_slice(r))
    t_p = Polynomial(t_evals, Basis.LAGRANGE_COSET, Layout.REGULAR, BN254_FR)
    t_c = t_p.to_canonical().data  # (L, 4n)
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
    t0 = _mark("quotient", t0)

    # ---- 5. linearized polynomial (gnark computeLinearizedPolynomial,
    # prove.go:707-836) ---------------------------------------------------------
    from ...curves.ref import G1

    m2 = n + 2
    zeta_m2 = pow(zeta, m2, p)
    omega_zeta = zeta * vk.generator % p

    # foldedH = h1 + zeta^(n+2) h2 + zeta^(2(n+2)) h3 (coefficient form)
    zm = f.const(zeta_m2, mont=True)
    zm2 = f.const(zeta_m2 * zeta_m2 % p, mont=True)
    folded_h = f.add(
        h1,
        f.add(
            f.mul(f.broadcast_const(zm, h2), h2),
            f.mul(f.broadcast_const(zm2, h3), h3),
        ),
    )

    # evaluations at zeta of the blinded wires and s1, s2 + zu at omega*zeta
    def pad_to(x, m):
        return jnp.pad(x, ((0, 0), (0, m - x.shape[1])))

    maxm = z_hat.shape[1]
    eval_stack = jnp.stack(
        [
            pad_to(l_hat, maxm),
            pad_to(r_hat, maxm),
            pad_to(o_hat, maxm),
            pad_to(pk.s_coeffs["s1"], maxm),
            pad_to(pk.s_coeffs["s2"], maxm),
            pad_to(folded_h, maxm),
        ],
        axis=1,
    )
    lb, rb, ob, s1b, s2b, fhb = kzg.eval_many_dev(eval_stack, zeta)
    zu = kzg.eval_many_dev(z_hat.reshape(f.n, 1, -1), omega_zeta)[0]
    qcp_zeta = []
    if n_com:
        qstack = jnp.stack([pad_to(c, maxm) for c in pk.qcp_coeffs], axis=1)
        qcp_zeta = [v % p for v in kzg.eval_many_dev(qstack, zeta)]

    # scalar weights of the linearized polynomial
    l1_zeta = (
        (pow(zeta, n, p) - 1)
        * pow(n * (zeta - 1) % p, -1, p)
        % p
    )
    s3_scal = (
        alpha
        * zu
        % p
        * beta
        % p
        * ((lb + beta * s1b + gamma) % p)
        % p
        * ((rb + beta * s2b + gamma) % p)
        % p
    )
    z_scal = (
        -alpha
        * ((lb + beta * zeta + gamma) % p)
        * ((rb + beta * vk.k1 % p * zeta + gamma) % p)
        % p
        * ((ob + beta * vk.k2 % p * zeta + gamma) % p)
        + alpha * alpha % p * l1_zeta
    ) % p
    rl = lb * rb % p

    # BSB22: the linearization gains sum_i qcp_i(zeta) * P_i(X)
    # (computeLinearizedPolynomial's qcpzeta/cCommitments args, prove.go:753-765)
    lin_stack = jnp.stack(
        [
            pad_to(pk.q_coeffs["ql"], maxm),
            pad_to(pk.q_coeffs["qr"], maxm),
            pad_to(pk.q_coeffs["qm"], maxm),
            pad_to(pk.q_coeffs["qo"], maxm),
            pad_to(pk.q_coeffs["qc"], maxm),
            pad_to(pk.s_coeffs["s3"], maxm),
            pad_to(z_hat, maxm),
        ]
        + [pad_to(c, maxm) for c in c_coeffs],
        axis=1,
    )
    wts = f.array([lb, rb, rl, ob, 1, s3_scal, z_scal] + qcp_zeta).reshape(
        f.n, 7 + n_com, 1
    )
    lin = f.sum(f.mul(lin_stack, wts), axis=1)  # (L, maxm)
    lin_zeta = kzg.eval_many_dev(lin.reshape(f.n, 1, -1), zeta)[0]
    lin_com = kzg.commit_dev(pk.srs, f.from_mont(lin))

    # folded H digest (host, 2 tiny scalar muls — verifier recomputes it)
    folded_h_com = G1.add(
        h1_com,
        G1.add(G1.mul(h2_com, zeta_m2), G1.mul(h3_com, zeta_m2 * zeta_m2 % p)),
    )

    # ---- 6. batched opening at zeta + Z at omega*zeta -------------------------
    # BSB22: the qcp trace polynomials join the batched opening at positions
    # 7+ (batchOpening, prove.go:778-812)
    claimed = [fhb, lin_zeta, lb, rb, ob, s1b, s2b] + qcp_zeta
    digests = [folded_h_com, lin_com, l_com, r_com, o_com, vk.s1, vk.s2] + list(
        vk.qcp
    )
    # gnark kzg.BatchOpenSinglePoint fold challenge: fresh transcript over
    # (zeta, digests, claimed values, Z(omega*zeta) bytes) — prove.go:823-833
    nu = kzg_fold_challenge(
        zeta, digests, claimed, [fr_bytes(zu)], p, hash_factory=pcfg.kzg_fold_hash
    )

    open_stack = jnp.stack(
        [
            pad_to(folded_h, maxm),
            pad_to(lin, maxm),
            pad_to(l_hat, maxm),
            pad_to(r_hat, maxm),
            pad_to(o_hat, maxm),
            pad_to(pk.s_coeffs["s1"], maxm),
            pad_to(pk.s_coeffs["s2"], maxm),
        ]
        + [pad_to(c, maxm) for c in pk.qcp_coeffs],
        axis=1,
    )
    nupows = [pow(nu, i, p) for i in range(len(claimed))]
    np_ = f.array(nupows).reshape(f.n, len(claimed), 1)
    folded_poly = f.sum(f.mul(open_stack, np_), axis=1)
    q_poly, _ = kzg.div_by_linear_dev(folded_poly, zeta)
    batched_h = kzg.commit_dev(pk.srs, f.from_mont(q_poly))
    q2, _ = kzg.div_by_linear_dev(z_hat, omega_zeta)
    z_shifted_h = kzg.commit_dev(pk.srs, f.from_mont(q2))
    _mark("open", t0)

    return PlonkProof(
        l_com=l_com,
        r_com=r_com,
        o_com=o_com,
        z_com=z_com,
        h1_com=h1_com,
        h2_com=h2_com,
        h3_com=h3_com,
        bsb22_commitments=bsb22_points,
        batched_h=batched_h,
        claimed_values=claimed,
        z_shifted_h=z_shifted_h,
        z_shifted_value=zu,
    )
