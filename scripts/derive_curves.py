"""Offline derivation of BLS24-315 / BLS24-317 / BW6-633 constants.

Derives from first principles (seed -> p, r; Hasse/CM -> traces and twist
orders; tower.py extension arithmetic -> generators via Tonelli-Shanks) and
prints the constant blocks pasted into the host curve modules. Everything it
prints is re-verified by tests/test_bls24_bw6633.py."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpusnark.curves.tower import ext_sqrt, make_ext, prime_field


def ec_add(p1, p2, K):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if y1 == y2:
            if y1.is_zero():
                return None
            m = x1 * x1 * 3 * (y1 + y1).inv()
        else:
            return None
    else:
        m = (y2 - y1) * (x2 - x1).inv()
    x3 = m * m - x1 - x2
    return (x3, m * (x1 - x3) - y1)


def ec_mul(pt, k, K):
    acc = None
    while k:
        if k & 1:
            acc = ec_add(acc, pt, K)
        pt = ec_add(pt, pt, K)
        k >>= 1
    return acc


def find_point(K, b, q, xs=None):
    """First curve point y^2 = x^3 + b over K (order q) at small/simple x."""
    cand = xs or [K.from_int(i) for i in range(1, 60)]
    for x in cand:
        rhs = x * x * x + b
        y = ext_sqrt(K, rhs, q)
        if y is not None:
            return (x, y)
    return None


def bls24(x, name):
    r = x**8 - x**4 + 1
    p = ((x - 1) ** 2 * r) // 3 + x
    t = x + 1
    n1 = p + 1 - t
    h1 = n1 // r
    assert n1 % r == 0
    Fp = prime_field(p)

    # Fp2 nonresidue A2 (u^2 = A2) also valid as the w^24 binomial for the
    # direct Fp24 tower when possible; independently find a Z2 in Fp2 with
    # X^12 - Z2 irreducible (Z2 non-square & non-cube in Fp2, -4 Z2 not 4th pw)
    def is_pow(K, a, q, e):
        if math.gcd(e, q - 1) == 1:
            return True
        return a.pow((q - 1) // math.gcd(e, q - 1)) == K.one()

    A2 = None
    for cand in [-1, -2, -5, -13, -17, 2, 3, 5, 7, 11, 13]:
        if not is_pow(Fp, Fp.from_int(cand), p, 2):
            A2 = cand
            break
    Fp2 = make_ext(Fp, 2, A2, "Fp2")
    q2 = p * p
    Z2 = None
    for c0 in range(0, 4):
        for c1 in range(0, 4):
            if c0 == 0 and c1 == 0:
                continue
            z = Fp2((c0, c1))
            if (
                not is_pow(Fp2, z, q2, 2)
                and not is_pow(Fp2, z, q2, 3)
                and not is_pow(Fp2, z * (-4), q2, 4)
            ):
                Z2 = (c0, c1)
                break
        if Z2:
            break
    # G1 curve b
    b1 = None
    for b in range(1, 20):
        pt = find_point(Fp, Fp.from_int(b), p)
        if pt and ec_mul(pt, n1, Fp) is None:
            b1 = b
            break
    g1 = find_point(Fp, Fp.from_int(b1), p)
    g1 = ec_mul(g1, h1, Fp)
    assert ec_mul(g1, r, Fp) is None

    # twist over Fp4 = Fp2[v]/(v^2 - Z2)
    Fp4 = make_ext(Fp2, 2, Fp2(Z2), "Fp4")
    q4 = p**4
    t2 = t * t - 2 * p
    t4 = t2 * t2 - 2 * p * p
    f4sq = (4 * q4 - t4 * t4) // 3
    f4 = math.isqrt(f4sq)
    assert f4 * f4 == f4sq
    n2a = q4 + 1 - (t4 + 3 * f4) // 2
    n2b = q4 + 1 - (t4 - 3 * f4) // 2
    v = Fp4((Fp2((0, 0)), Fp2((1, 0))))
    twist = None
    for tag, bp in [("D(b/v)", v.inv() * b1), ("M(b*v)", v * b1)]:
        for n2 in (n2a, n2b):
            if n2 % r:
                continue
            pt = find_point(Fp4, bp, q4)
            if pt is not None and ec_mul(pt, n2, Fp4) is None:
                twist = (tag, bp, n2)
                break
        if twist:
            break
    tag, bp, n2 = twist
    h2 = n2 // r
    g2 = find_point(Fp4, bp, q4)
    g2 = ec_mul(g2, h2, Fp4)
    assert ec_mul(g2, r, Fp4) is None

    def f4c(e):
        return tuple(
            (c.c[0].v, c.c[1].v) for c in e.c
        )  # ((c00,c01),(c10,c11)) with e = c0 + c1 v, ci = ci0 + ci1 u

    print(f"# === {name} ===")
    print(f"X_SEED = {hex(x) if x > 0 else '-' + hex(-x)}")
    print(f"P = {hex(p)}")
    print(f"R = {hex(r)}")
    print(f"A2 = {A2}  # u^2 = A2")
    print(f"Z2 = {Z2}  # v^2 = Z2 (Fp2 elem), w^12 = Z2, v = w^6")
    print(f"B1 = {b1}")
    print(f"TWIST = {tag!r}")
    print(f"H1 = {hex(h1)}")
    print(f"H2 = {hex(h2)}")
    print(f"G1_GEN = ({hex(g1[0].v)}, {hex(g1[1].v)})")
    print(f"G2_GEN = {f4c(g2[0])}, {f4c(g2[1])}")
    print()
    return p


def bw6_633():
    # base: BLS24-315
    x = -0xBFCFFFFF
    r24 = x**8 - x**4 + 1
    rb = ((x - 1) ** 2 * r24) // 3 + x  # = p of BLS24-315
    p = 0x126633CC0F35F63FC1A174F01D72AB5A8FCD8C75D79D2C74E59769AD9BBDA2F8152A6C0FADEA490B8DA9F5E83F57C497E0E8850EDBDA407D7B5CE7AB839C2253D369BD31147F73CD74916EA4570000D
    lim = 2 * math.isqrt(p)
    base_t = (p + 1) % rb
    cands = []
    m = -(lim // rb) - 2
    while base_t + m * rb <= lim:
        t = base_t + m * rb
        m += 1
        if abs(t) > lim:
            continue
        d = 4 * p - t * t
        if d <= 0 or d % 3:
            continue
        f = math.isqrt(d // 3)
        if 3 * f * f == d:
            cands.append((t, f))
    Fp = prime_field(p)
    for t, f in cands:
        n1 = p + 1 - t
        if n1 % rb:
            continue
        for b in list(range(-10, 0)) + list(range(1, 20)):
            pt = find_point(Fp, Fp.from_int(b), p)
            if pt is None:
                continue
            if ec_mul(pt, n1, Fp) is None:
                h1 = n1 // rb
                # sextic twist: w^6 = zeta, twist curve y^2 = x^3 + b*zeta
                # or b/zeta with order p+1-(t±3f)/2
                n2s = [p + 1 - (t + 3 * f) // 2, p + 1 - (t - 3 * f) // 2]

                def is_pow(a, e):
                    g = math.gcd(e, p - 1)
                    return pow(a % p, (p - 1) // g, p) == 1

                for zeta in list(range(-10, 0)) + list(range(2, 20)):
                    if is_pow(zeta, 2) or is_pow(zeta, 3):
                        continue
                    for tag, bp in [
                        ("M(b*z)", b * zeta),
                        ("D(b/z)", b * pow(zeta, -1, p)),
                    ]:
                        for n2 in n2s:
                            if n2 % rb:
                                continue
                            pt2 = find_point(Fp, Fp.from_int(bp), p)
                            if pt2 is None:
                                continue
                            if ec_mul(pt2, n2, Fp) is None:
                                h2 = n2 // rb
                                g1 = ec_mul(
                                    find_point(Fp, Fp.from_int(b), p), h1, Fp
                                )
                                g2 = ec_mul(pt2, h2, Fp)
                                assert ec_mul(g1, rb, Fp) is None
                                assert ec_mul(g2, rb, Fp) is None
                                print("# === BW6-633 ===")
                                print(f"P = {hex(p)}")
                                print(f"R = {hex(rb)}  # = BLS24-315 p")
                                print(f"TRACE = ((P+1) %% R) + {(t - base_t) // rb} * R")
                                print(f"B1 = {b}; ZETA = {zeta}; TWIST = {tag!r}")
                                print(f"H1 = {hex(h1)}")
                                print(f"H2 = {hex(h2)}")
                                print(f"G1_GEN = ({hex(g1[0].v)}, {hex(g1[1].v)})")
                                print(f"G2_GEN = ({hex(g2[0].v)}, {hex(g2[1].v)})")
                                return
    print("BW6-633: nothing found")


if __name__ == "__main__":
    bls24(-0xBFCFFFFF, "BLS24-315")
    bls24(0xD9018000, "BLS24-317")
    bw6_633()
