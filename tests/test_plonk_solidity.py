"""PLONK Solidity verifier export (reference plonk solidity template,
/root/reference/backend/plonk/bn254/solidity.go, exposed via ExportSolidity):
generate the contract, parse the embedded constants back out, and execute
the contract's exact algorithm with host curve ops standing in for the EVM
precompiles (no solc in this image). The challenge derivation uses the
contract's own sha256 byte layout — matching it against a proof our verifier
accepts cross-checks the codegen's transcript encoding."""

import hashlib
import re

import pytest

from tpusnark.backend import plonk
from tpusnark.backend.plonk.solidity import export_solidity, proof_to_solidity_calldata
from tpusnark.curves.ref import G1, Fp2, pairing_check
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.plonk_builder import PlonkBuilder

P = BN254_FR.modulus


def _const(src, name):
    return int(re.search(rf"constant {name} = (\d+);", src).group(1))


def _artifacts():
    import random

    b = PlonkBuilder(P)
    x = b.secret("x")
    y = b.public("y")
    x3 = b.mul(x, x, x)
    b.assert_is_equal(b.add(x3, x, 5), y)
    cs = b.compile()
    pk, vk = plonk.setup(cs, tau=987654321)
    r = random.Random(7)
    proof = plonk.prove(cs, pk, {"x": 3, "y": 35}, rng=lambda: r.randrange(1, P))
    return cs, pk, vk, proof


def _w(x):
    return int(x).to_bytes(32, "big")


def _simulate_contract(src, cd, inputs):
    """Run verifyProof exactly as the generated source computes it, with
    G1.add/G1.mul/pairing_check as the precompile stand-ins. Returns True
    iff the contract would NOT revert."""
    R_MOD = _const(src, "R_MOD")
    N = _const(src, "N")
    OMEGA = _const(src, "OMEGA")
    K1 = _const(src, "K1")
    K2 = _const(src, "K2")
    NPUB = _const(src, "N_PUBLIC")
    pts = {}
    for nm in ("S1", "S2", "S3", "QL", "QR", "QM", "QO", "QK"):
        pts[nm] = (_const(src, f"{nm}_X"), _const(src, f"{nm}_Y"))
    g2_1 = (
        Fp2(_const(src, "G2_X0"), _const(src, "G2_X1")),
        Fp2(_const(src, "G2_Y0"), _const(src, "G2_Y1")),
    )
    g2_x = (
        Fp2(_const(src, "G2X_X0"), _const(src, "G2X_X1")),
        Fp2(_const(src, "G2X_Y0"), _const(src, "G2X_Y1")),
    )

    def pt(i):  # calldata point -> host point (0,0 = infinity)
        return None if cd[i] == 0 and cd[i + 1] == 0 else (cd[i], cd[i + 1])

    def ecmul(p_, s):
        return None if p_ is None else G1.mul(p_, s % R_MOD)

    if any(v >= R_MOD for v in inputs):
        return False

    # deriveChallenges — byte-for-byte what the contract hashes
    vk_words = b"".join(
        _w(v) for nm in ("S1", "S2", "S3", "QL", "QR", "QM", "QO", "QK") for v in pts[nm]
    )
    g = hashlib.sha256(
        b"gamma"
        + vk_words
        + b"".join(_w(v) for v in inputs)
        + b"".join(_w(cd[i]) for i in range(6))
    ).digest()
    bta = hashlib.sha256(b"beta" + g).digest()
    a = hashlib.sha256(b"alpha" + bta + _w(cd[6]) + _w(cd[7])).digest()
    z = hashlib.sha256(
        b"zeta" + a + b"".join(_w(cd[i]) for i in range(8, 14))
    ).digest()
    gamma, beta = int.from_bytes(g, "big") % R_MOD, int.from_bytes(bta, "big") % R_MOD
    alpha, zeta = int.from_bytes(a, "big") % R_MOD, int.from_bytes(z, "big") % R_MOD

    zn = pow(zeta, N, R_MOD)
    zh = (zn - 1) % R_MOD
    if zh == 0:
        return False
    n_inv = pow(N, -1, R_MOD)
    l1 = zh * n_inv % R_MOD * pow((zeta - 1) % R_MOD, -1, R_MOD) % R_MOD
    pi, wi = 0, 1
    for v in inputs[:NPUB]:
        li = wi * zh % R_MOD * n_inv % R_MOD * pow((zeta - wi) % R_MOD, -1, R_MOD) % R_MOD
        pi = (pi + v * li) % R_MOD
        wi = wi * OMEGA % R_MOD
    perm = (
        alpha * cd[21] % R_MOD
        * ((cd[16] + beta * cd[19] + gamma) % R_MOD)
        % R_MOD
        * ((cd[17] + beta * cd[20] + gamma) % R_MOD)
        % R_MOD
        * ((cd[18] + gamma) % R_MOD)
        % R_MOD
    )
    lhs = (cd[15] + pi + perm - alpha * alpha % R_MOD * l1) % R_MOD
    if lhs != zh * cd[14] % R_MOD:
        return False

    zm2 = zn * zeta % R_MOD * zeta % R_MOD
    fh = G1.add(
        pt(8), G1.add(ecmul(pt(10), zm2), ecmul(pt(12), zm2 * zm2 % R_MOD))
    )
    s3s = (
        alpha * cd[21] % R_MOD * beta % R_MOD
        * ((cd[16] + beta * cd[19] + gamma) % R_MOD)
        % R_MOD
        * ((cd[17] + beta * cd[20] + gamma) % R_MOD)
        % R_MOD
    )
    zs = (
        -alpha
        * ((cd[16] + beta * zeta + gamma) % R_MOD)
        * ((cd[17] + beta * K1 % R_MOD * zeta + gamma) % R_MOD)
        % R_MOD
        * ((cd[18] + beta * K2 % R_MOD * zeta + gamma) % R_MOD)
        + alpha * alpha % R_MOD * l1
    ) % R_MOD
    lc = None
    for nm, s in [
        ("QL", cd[16]),
        ("QR", cd[17]),
        ("QM", cd[16] * cd[17] % R_MOD),
        ("QO", cd[18]),
        ("QK", 1),
    ]:
        lc = G1.add(lc, ecmul(pts[nm], s))
    lc = G1.add(lc, ecmul(pts["S3"], s3s))
    lc = G1.add(lc, ecmul(pt(6), zs))

    def xy(p_):
        return (0, 0) if p_ is None else p_

    nu = (
        int.from_bytes(
            hashlib.sha256(
                b"gamma"
                + _w(zeta)
                + _w(xy(fh)[0]) + _w(xy(fh)[1]) + _w(xy(lc)[0]) + _w(xy(lc)[1])
                + b"".join(_w(cd[i]) for i in range(6))
                + b"".join(_w(v) for v in (*pts["S1"], *pts["S2"]))
                + b"".join(_w(cd[14 + i]) for i in range(8))
            ).digest(),
            "big",
        )
        % R_MOD
    )
    ds = [fh, lc, pt(0), pt(2), pt(4), pts["S1"], pts["S2"]]
    fd, fv, ch = None, 0, 1
    for i, d in enumerate(ds):
        fd = G1.add(fd, ecmul(d, ch))
        fv = (fv + ch * cd[14 + i]) % R_MOD
        ch = ch * nu % R_MOD

    u = (
        int.from_bytes(
            hashlib.sha256(
                _w(xy(fd)[0]) + _w(xy(fd)[1]) + _w(fv)
                + _w(cd[6]) + _w(cd[7]) + _w(zeta) + _w(cd[21])
                + _w(cd[22]) + _w(cd[23]) + _w(cd[24]) + _w(cd[25])
            ).digest(),
            "big",
        )
        % R_MOD
    )
    gen = (1, 2)
    t1 = G1.add(fd, G1.neg(ecmul(gen, fv)))
    t1 = G1.add(t1, ecmul(pt(22), zeta))
    oz = OMEGA * zeta % R_MOD
    t2 = G1.add(pt(6), G1.neg(ecmul(gen, cd[21])))
    t2 = G1.add(t2, ecmul(pt(24), oz))
    t2 = ecmul(t2, u)
    f = G1.add(t1, t2)
    hf = G1.add(pt(22), ecmul(pt(24), u))
    return pairing_check([(f, g2_1), (G1.neg(hf), g2_x)])


@pytest.mark.slow
def test_plonk_solidity_simulated_evm():
    _, _, vk, proof = _artifacts()
    src = export_solidity(vk)
    assert src.count("{") == src.count("}")
    assert _const(src, "QL_X") == (vk.ql[0] if vk.ql else 0)
    assert _const(src, "N") == vk.n
    cd = proof_to_solidity_calldata(proof)
    assert len(cd) == 26

    # sanity: our own verifier accepts this proof
    assert plonk.verify(proof, vk, [35])
    # contract algorithm accepts
    assert _simulate_contract(src, cd, [35])
    # wrong public input rejected
    assert not _simulate_contract(src, cd, [36])
    # tampered claimed value rejected
    cd_bad = list(cd)
    cd_bad[16] = (cd_bad[16] + 1) % _const(src, "R_MOD")
    assert not _simulate_contract(src, cd_bad, [35])
    # tampered quotient point rejected (u binds batched_h)
    cd_bad2 = list(cd)
    pt22 = (cd[22], cd[23])
    tam = G1.double(pt22) if pt22 != (0, 0) else (1, 2)
    cd_bad2[22], cd_bad2[23] = tam
    assert not _simulate_contract(src, cd_bad2, [35])


def test_plonk_solidity_rejects_bsb22_vk():
    class FakeVk:
        qcp = [(1, 2)]
        commitment_constraint_indexes = [0]

    with pytest.raises(NotImplementedError):
        export_solidity(FakeVk())
