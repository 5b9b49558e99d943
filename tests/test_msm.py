"""MSM tests vs naive Python oracle (G1 and G2), incl. edge cases.

Parity surface: gnark-crypto MultiExp correctness at small sizes
(reference: backend/groth16/bn254/prove.go:201-290; MSM vectors SURVEY.md §7
step 3 gate)."""

import random

import pytest

from tpusnark.curves.jcurve import g1_ops, g2_ops
from tpusnark.curves.ref import G1, G2, R
from tpusnark.fields.jfield import Field
from tpusnark.fields.spec import BN254_FP, BN254_FR
from tpusnark.msm.pippenger import MSM, get_msm

from tests.test_curve import dec_g1_proj, dec_g2_proj, enc_g1, enc_g2, fp

rng = random.Random(11)
fr = Field(BN254_FR)


def run_msm_g1(points, scalars, c=6):
    msm = get_msm("g1", c)
    sc = fr.array(scalars, mont=False)
    out = msm(enc_g1(points), sc)
    return dec_g1_proj(out)[0]


def ref_msm_g1(points, scalars):
    acc = None
    for pt, s in zip(points, scalars):
        acc = G1.add(acc, G1.mul(pt, s))
    return acc


@pytest.mark.parametrize(
    "n",
    [1, 2, 7, pytest.param(64, marks=pytest.mark.slow)],
)
def test_msm_g1_random(n):
    g = G1.generator()
    pts = [G1.mul(g, rng.randrange(1, R)) for _ in range(n)]
    scs = [rng.randrange(R) for _ in range(n)]
    assert run_msm_g1(pts, scs) == ref_msm_g1(pts, scs)


def test_msm_g1_edge_cases():
    g = G1.generator()
    q = G1.mul(g, 5)
    # zero scalars, infinity points, duplicate points (forces equal-point adds)
    pts = [g, q, None, q, q, G1.neg(q)]
    scs = [0, 3, 7, 3, R - 1, 1]
    assert run_msm_g1(pts, scs) == ref_msm_g1(pts, scs)


def test_msm_g1_all_zero():
    g = G1.generator()
    assert run_msm_g1([g, g], [0, 0]) is None


def test_msm_g1_single_large():
    g = G1.generator()
    s = R - 12345
    assert run_msm_g1([g], [s]) == G1.mul(g, s)


def test_msm_g1_pippenger_logscan_path():
    """N > ladder_threshold and < strip_threshold: the sorted log-scan
    bucket pipeline (ladder covers the tiny parametrized cases above)."""
    g = G1.generator()
    n = 128
    pts, P = [], g
    for _ in range(n):
        pts.append(P)
        P = G1.add(P, g)
    scs = [rng.randrange(R) for _ in range(n)]
    msm = get_msm("g1", 5)
    assert n > msm.ladder_threshold and n < msm.strip_threshold
    sc = fr.array(scs, mont=False)
    got = dec_g1_proj(msm(enc_g1(pts), sc))[0]
    assert got == ref_msm_g1(pts, scs)


def test_msm_g1_strip_path():
    """The O(N)-adds strip accumulation (flush records + compaction), with
    the threshold lowered so it runs at test size. Covers VERDICT r1 weak #4
    (strip path previously untested). Includes duplicates, infinities and
    zero scalars so flush/compaction edge cases are exercised."""
    g = G1.generator()
    n = 256
    msm = MSM(get_msm("g1", 5).ops, fr, c=5, strip_threshold=128, strips=16)
    pts, P = [], g
    for _ in range(n - 4):
        pts.append(P)
        P = G1.add(P, g)
    pts += [None, pts[0], pts[0], G1.neg(pts[1])]
    scs = [rng.randrange(R) for _ in range(n - 4)] + [7, 0, 5, 1]
    sc = fr.array(scs, mont=False)
    got = dec_g1_proj(msm(enc_g1(pts), sc))[0]
    assert got == ref_msm_g1(pts, scs)


def test_msm_g2():
    g = G2.generator()
    n = 8
    pts = [G2.mul(g, rng.randrange(1, R)) for _ in range(n)]
    scs = [rng.randrange(R) for _ in range(n)]
    msm = get_msm("g2", 4)
    out = msm(enc_g2(pts), fr.array(scs, mont=False))
    got = dec_g2_proj(out)[0]
    want = None
    for pt, s in zip(pts, scs):
        want = G2.add(want, G2.mul(pt, s))
    assert got == want
