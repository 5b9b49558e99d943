"""PlonkFRI setup / prove / verify.

Reference shape: /root/reference/backend/plonkfri/bn254/setup.go:101 (Setup:
selector + permutation polynomials, FRI-committed), prove.go:70 (Prove:
solve -> commit L,R,O -> gamma,beta -> Z -> alpha -> quotient -> openings),
verify.go:31 (Verify: replay challenges, pointwise identity at the opened
positions, batch FRI proximity).

Identity checked at each queried LDE position x (all positions lie on the
coset g<Omega>, disjoint from the evaluation domain H, so the check is a
Schwartz-Zippel test of the full polynomial identity):

    ql l + qr r + qm l r + qo o + qc + PI(x)
  + alpha [ z (l+bx+g)(r+b k1 x+g)(o+b k2 x+g)
            - z(wx) (l+b s1+g)(r+b s2+g)(o+b s3+g) ]
  + alpha^2 L1(x) (z - 1)
  == (x^n - 1) (h1 + x^n h2 + x^{2n} h3)

Low-degreeness of every committed column is established by ONE batched FRI
proximity proof over a random linear combination (correlated agreement).

Host big-int implementation (see poly/fri.py docstring for why).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ...constraint.scs import SparseConstraintSystem, solve_scs
from ...fields.spec import BN254_FR
from ...poly.domain import Domain
from ...poly.fri import FriParams, FriProof, FriScheme, MerkleTree
from ...protocols.sumcheck import Transcript
from ..plonk.setup import _next_pow2, build_permutation, pick_cosets

# committed-column order: fixed (setup) then online (prover) then quotient
FIXED_COLS = ("ql", "qr", "qm", "qo", "qc", "s1", "s2", "s3")
ONLINE_COLS = ("l", "r", "o", "z")
H_COLS = ("h1", "h2", "h3")
ALL_COLS = FIXED_COLS + ONLINE_COLS + H_COLS

N_IDENTITY_QUERIES = 20


@dataclass
class PlonkFriVerifyingKey:
    n: int
    generator: int
    k1: int
    k2: int
    n_public: int
    blowup: int
    fri_params: FriParams
    fixed_roots: dict  # name -> Merkle root (bytes)


@dataclass
class PlonkFriProvingKey:
    vk: PlonkFriVerifyingKey
    fixed_coeffs: dict   # name -> list[int]
    fixed_codewords: dict  # name -> (codeword, MerkleTree)


@dataclass
class ColumnOpening:
    value: int
    path: list[bytes]


@dataclass
class IdentityQuery:
    index: int
    openings: dict            # col name -> ColumnOpening
    z_shift: ColumnOpening    # z at index + blowup (mod N)


@dataclass
class PlonkFriProof:
    online_roots: dict        # name -> root for l, r, o, z, h1, h2, h3
    identity_queries: list[IdentityQuery] = field(default_factory=list)
    fri_proof: FriProof | None = None
    fri_queries: list[dict] = field(default_factory=list)  # per FRI query:
    # col name -> ColumnOpening at the FRI top-layer index (links the batch
    # codeword G to the individual column commitments)


def _scheme(vk: PlonkFriVerifyingKey) -> FriScheme:
    return FriScheme(BN254_FR, vk.n, vk.fri_params)


# ---------------------------------------------------------------------- setup
def setup(cs: SparseConstraintSystem, fri_params: FriParams | None = None):
    p = cs.modulus
    n = _next_pow2(max(8, cs.n_gates))
    params = fri_params or FriParams()
    k1, k2 = pick_cosets(n, p)
    dom = Domain(BN254_FR, n)

    (_, _, _), q = cs.gate_arrays()
    pad = n - cs.n_gates
    q_evals = {name: vals + [0] * pad for name, vals in q.items()}
    name_map = {"qL": "ql", "qR": "qr", "qM": "qm", "qO": "qo", "qC": "qc"}

    sigma = build_permutation(cs, n)
    ks = (1, k1, k2)
    s_evals = {}
    for col, name in enumerate(("s1", "s2", "s3")):
        vals = []
        for row in range(n):
            t = sigma[col * n + row]
            tcol, trow = divmod(t, n)
            vals.append(ks[tcol] * dom.powers[trow] % p)
        s_evals[name] = vals

    vk = PlonkFriVerifyingKey(
        n=n, generator=dom.generator, k1=k1, k2=k2, n_public=cs.n_public,
        blowup=params.blowup, fri_params=params, fixed_roots={},
    )
    scheme = _scheme(vk)
    fixed_coeffs = {}
    fixed_codewords = {}
    for src, name in list(zip(q_evals, map(name_map.get, q_evals))) :
        fixed_coeffs[name] = dom.intt_ref(q_evals[src])
    for name in ("s1", "s2", "s3"):
        fixed_coeffs[name] = dom.intt_ref(s_evals[name])
    for name, coeffs in fixed_coeffs.items():
        root, handle = scheme.commit(coeffs)
        vk.fixed_roots[name] = root
        fixed_codewords[name] = handle

    if cs.commitments:
        raise NotImplementedError("PlonkFRI does not support BSB22 commitments")
    return PlonkFriProvingKey(vk, fixed_coeffs, fixed_codewords), vk


# ---------------------------------------------------------------------- prove
def prove(cs: SparseConstraintSystem, pk: PlonkFriProvingKey, assignment: dict):
    p = cs.modulus
    vk = pk.vk
    n = vk.n
    dom = Domain(BN254_FR, n)
    scheme = _scheme(vk)
    N = scheme.N

    # ---- 1. solve + wire columns
    W = solve_scs(cs, assignment)
    pubs = [int(x) % p for x in W[: cs.n_public]]
    pad = n - cs.n_gates
    l_e = [int(W[g.xa]) % p for g in cs.gates] + [0] * pad
    r_e = [int(W[g.xb]) % p for g in cs.gates] + [0] * pad
    o_e = [int(W[g.xc]) % p for g in cs.gates] + [0] * pad

    coeffs = {
        "l": dom.intt_ref(l_e),
        "r": dom.intt_ref(r_e),
        "o": dom.intt_ref(o_e),
    }

    tr = Transcript(p)
    for name in FIXED_COLS:
        tr.absorb(int.from_bytes(vk.fixed_roots[name], "big") % p)
    for x in pubs:
        tr.absorb(x)

    roots = {}
    handles = dict(pk.fixed_codewords)
    for name in ("l", "r", "o"):
        root, handle = scheme.commit(coeffs[name])
        roots[name] = root
        handles[name] = handle
        tr.absorb(int.from_bytes(root, "big") % p)
    gamma = tr.challenge()
    beta = tr.challenge()

    # ---- 2. grand product Z over the small domain
    s_evals = {name: scheme_small_evals(pk, name, dom) for name in ("s1", "s2", "s3")}
    z_e = [1]
    for j in range(n - 1):
        wj = dom.powers[j]
        num = (
            (l_e[j] + beta * wj + gamma)
            * (r_e[j] + beta * vk.k1 * wj + gamma)
            * (o_e[j] + beta * vk.k2 * wj + gamma)
        ) % p
        den = (
            (l_e[j] + beta * s_evals["s1"][j] + gamma)
            * (r_e[j] + beta * s_evals["s2"][j] + gamma)
            * (o_e[j] + beta * s_evals["s3"][j] + gamma)
        ) % p
        z_e.append(z_e[-1] * num % p * pow(den, p - 2, p) % p)
    coeffs["z"] = dom.intt_ref(z_e)
    root, handle = scheme.commit(coeffs["z"])
    roots["z"] = root
    handles["z"] = handle
    tr.absorb(int.from_bytes(root, "big") % p)
    alpha = tr.challenge()

    # ---- 3. quotient on the LDE coset
    lde = {name: handles[name][0] for name in FIXED_COLS + ("l", "r", "o", "z")}
    # PI polynomial evaluations on the coset: interpolate pubs over H
    pi_small = pubs + [0] * (n - len(pubs))
    pi_lde = scheme.lde(dom.intt_ref(pi_small))
    # L1 on the coset: (x^n - 1) / (n (x - 1))
    n_inv = pow(n, p - 2, p)
    h_coeff_num = [0] * N
    z_shift = handles["z"][0]
    for i in range(N):
        x = scheme.offset * pow(scheme.omega, i, p) % p
        xn = pow(x, n, p)
        zh = (xn - 1) % p
        l_, r_, o_, z_ = lde["l"][i], lde["r"][i], lde["o"][i], lde["z"][i]
        zs = z_shift[(i + vk.blowup) % N]
        gate = (
            lde["ql"][i] * l_ + lde["qr"][i] * r_ + lde["qm"][i] * l_ % p * r_
            + lde["qo"][i] * o_ + lde["qc"][i] + pi_lde[i]
        ) % p
        perm = (
            z_ * ((l_ + beta * x + gamma) % p) % p
            * ((r_ + beta * vk.k1 % p * x + gamma) % p) % p
            * ((o_ + beta * vk.k2 % p * x + gamma) % p)
            - zs * ((l_ + beta * lde["s1"][i] + gamma) % p) % p
            * ((r_ + beta * lde["s2"][i] + gamma) % p) % p
            * ((o_ + beta * lde["s3"][i] + gamma) % p)
        ) % p
        l1 = zh * n_inv % p * pow((x - 1) % p, p - 2, p) % p
        num_i = (gate + alpha * perm + alpha * alpha % p * l1 % p * ((z_ - 1) % p)) % p
        h_coeff_num[i] = num_i * pow(zh, p - 2, p) % p

    # H coefficients: inverse LDE (un-coset + INTT), degree must be < 3n
    h_coeffs = _inverse_lde(scheme, h_coeff_num)
    assert all(c == 0 for c in h_coeffs[3 * n:]), "quotient degree overflow"
    h_parts = {
        "h1": h_coeffs[:n],
        "h2": h_coeffs[n: 2 * n],
        "h3": h_coeffs[2 * n: 3 * n],
    }
    for name in H_COLS:
        coeffs[name] = h_parts[name]
        root, handle = scheme.commit(h_parts[name])
        roots[name] = root
        handles[name] = handle
        tr.absorb(int.from_bytes(root, "big") % p)

    # ---- 4. batched FRI proximity over lambda-combination of ALL columns
    lam = tr.challenge()
    G = [0] * N
    lpow = 1
    for name in ALL_COLS:
        cw = handles[name][0]
        for i in range(N):
            G[i] = (G[i] + lpow * cw[i]) % p
        lpow = lpow * lam % p
    fri_proof = scheme.prove_proximity(G, tr)
    # component openings at the FRI top-layer query indices (both halves are
    # touched by the fold, so open idx and idx + N/2)
    fri_queries = []
    for q in fri_proof.queries:
        ops = {}
        for name in ALL_COLS:
            cw, tree = handles[name]
            ops[name] = (
                ColumnOpening(cw[q.index], tree.path(q.index)),
                ColumnOpening(cw[q.index + N // 2], tree.path(q.index + N // 2)),
            )
        fri_queries.append(ops)

    # ---- 5. identity spot checks
    queries = []
    for _ in range(N_IDENTITY_QUERIES):
        idx = tr.challenge() % N
        ops = {}
        for name in ALL_COLS:
            cw, tree = handles[name]
            ops[name] = ColumnOpening(cw[idx], tree.path(idx))
        zi = (idx + vk.blowup) % N
        zcw, ztree = handles["z"]
        queries.append(IdentityQuery(idx, ops, ColumnOpening(zcw[zi], ztree.path(zi))))

    return PlonkFriProof(roots, queries, fri_proof, fri_queries)


def scheme_small_evals(pk: PlonkFriProvingKey, name: str, dom: Domain):
    """Evaluations of a fixed column on the small domain H (coeff -> NTT)."""
    return dom.ntt_ref(pk.fixed_coeffs[name])


def _inverse_lde(scheme: FriScheme, evals: list[int]) -> list[int]:
    """Coefficients from evaluations on the coset offset*<omega> (size N)."""
    p = scheme.p
    coeffs = scheme.dom.intt_ref(evals)
    off_inv = pow(scheme.offset, p - 2, p)
    o = 1
    for j in range(len(coeffs)):
        coeffs[j] = coeffs[j] * o % p
        o = o * off_inv % p
    return coeffs


# --------------------------------------------------------------------- verify
def verify(proof: PlonkFriProof, vk: PlonkFriVerifyingKey, public_inputs: list[int]) -> bool:
    p = BN254_FR.modulus
    n = vk.n
    scheme = _scheme(vk)
    N = scheme.N
    pubs = [int(x) % p for x in public_inputs]
    if len(pubs) != vk.n_public:
        return False
    for name in ONLINE_COLS + H_COLS:
        if name not in proof.online_roots:
            return False

    tr = Transcript(p)
    for name in FIXED_COLS:
        tr.absorb(int.from_bytes(vk.fixed_roots[name], "big") % p)
    for x in pubs:
        tr.absorb(x)
    for name in ("l", "r", "o"):
        tr.absorb(int.from_bytes(proof.online_roots[name], "big") % p)
    gamma = tr.challenge()
    beta = tr.challenge()
    tr.absorb(int.from_bytes(proof.online_roots["z"], "big") % p)
    alpha = tr.challenge()
    for name in H_COLS:
        tr.absorb(int.from_bytes(proof.online_roots[name], "big") % p)
    lam = tr.challenge()

    def root_of(name):
        return vk.fixed_roots[name] if name in vk.fixed_roots else proof.online_roots[name]

    # ---- batched FRI proximity + linkage of G to the column commitments
    if proof.fri_proof is None:
        return False
    # the FRI proof's own top layer root must equal the lambda-combination
    # commitment; we don't have a separate G root — the proximity proof's
    # first layer root IS the commitment to G.  Verify proximity first
    # (replays the transcript), then check linkage at each query.
    g_top_root = proof.fri_proof.layer_roots[0] if proof.fri_proof.layer_roots else None
    if g_top_root is None:
        return False
    if not scheme.verify_proximity(g_top_root, proof.fri_proof, tr):
        return False
    if len(proof.fri_queries) != len(proof.fri_proof.queries):
        return False
    for q, ops in zip(proof.fri_proof.queries, proof.fri_queries):
        for half, (pos_get, fri_val) in enumerate(
            ((q.index, q.layers[0].value), (q.index + N // 2, q.layers[0].sibling))
        ):
            acc = 0
            lpow = 1
            for name in ALL_COLS:
                op = ops[name][half]
                if not MerkleTree.verify_path(root_of(name), pos_get, op.value, op.path):
                    return False
                acc = (acc + lpow * op.value) % p
                lpow = lpow * lam % p
            if acc != fri_val:
                return False

    # ---- identity spot checks
    n_inv = pow(n, p - 2, p)
    w = vk.generator
    for q in proof.identity_queries:
        idx = tr.challenge() % N
        if q.index != idx:
            return False
        vals = {}
        for name in ALL_COLS:
            op = q.openings[name]
            if not MerkleTree.verify_path(root_of(name), idx, op.value, op.path):
                return False
            vals[name] = op.value
        zi = (idx + vk.blowup) % N
        if not MerkleTree.verify_path(proof.online_roots["z"], zi,
                                      q.z_shift.value, q.z_shift.path):
            return False
        zs = q.z_shift.value

        x = scheme.offset * pow(scheme.omega, idx, p) % p
        xn = pow(x, n, p)
        zh = (xn - 1) % p
        # PI(x) by the Lagrange formula over H
        pi = 0
        wi = 1
        for pub in pubs:
            li = wi * zh % p * n_inv % p * pow((x - wi) % p, p - 2, p) % p
            pi = (pi + pub * li) % p
            wi = wi * w % p
        l1 = zh * n_inv % p * pow((x - 1) % p, p - 2, p) % p

        l_, r_, o_, z_ = vals["l"], vals["r"], vals["o"], vals["z"]
        gate = (
            vals["ql"] * l_ + vals["qr"] * r_ + vals["qm"] * l_ % p * r_
            + vals["qo"] * o_ + vals["qc"] + pi
        ) % p
        perm = (
            z_ * ((l_ + beta * x + gamma) % p) % p
            * ((r_ + beta * vk.k1 % p * x + gamma) % p) % p
            * ((o_ + beta * vk.k2 % p * x + gamma) % p)
            - zs * ((l_ + beta * vals["s1"] + gamma) % p) % p
            * ((r_ + beta * vals["s2"] + gamma) % p) % p
            * ((o_ + beta * vals["s3"] + gamma) % p)
        ) % p
        lhs = (gate + alpha * perm + alpha * alpha % p * l1 % p * ((z_ - 1) % p)) % p
        h = (vals["h1"] + xn * vals["h2"] + xn * xn % p * vals["h3"]) % p
        if lhs != zh * h % p:
            return False
    return True
