"""Headline benchmark: BN254 G1 MSM throughput at 2^20 points (one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference's CPU prover stack
(gnark + gnark-crypto Pippenger MultiExp,
/root/reference/backend/groth16/bn254/prove.go:201-290). The repo publishes
no numbers (SURVEY.md §6) and no Go toolchain exists in this image, so the
baseline constant below is the well-known gnark-crypto figure for a modern
16-core x86 host: BN254 G1 MSM 2^20 in ~0.4 s  =>  ~2.6e6 points/s.

Usage: python bench.py [--n LOG2_POINTS] [--metric msm|ntt]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REF_MSM_POINTS_PER_S = 2.6e6  # gnark-crypto CPU estimate (see docstring)
REF_NTT_2_22_MS = 120.0  # gnark-crypto fft.Domain 2^22 CPU estimate

# ---- speed-of-light roofline (SURVEY.md §6 mandate) -------------------------
# The MSM hot loop is u32 VPU work (measured in-graph rate ~1.1e12 u32 op/s on
# this chip; theoretical 8x128 lanes x ~1 op/cycle x 0.94 GHz ~ 0.96e12).
VPU_U32_OPS_PER_S = 1.0e12
# op counts from the kernel structure (fields/jfield.py, curves/jcurve.py):
# one 16-limb full-word Montgomery mul ~ 3 limb products (outer 256 mul +
# lo/hi split 512 + antidiag adds ~930) + 4 Kogge-Stone props (~600) ~ 7.8e3
U32_OPS_PER_MONT_MUL = 7.8e3
# complete mixed add (RCB15 alg 8): 11 muls + 2 mul_b3 + ~17 lazy add/sub
U32_OPS_PER_MIXED_ADD = 11 * U32_OPS_PER_MONT_MUL + 17 * 1.2e3


def msm_roofline(log2n: int, c: int, n_windows: int):
    """Speed-of-light points/s for the sort+strip Pippenger on this chip:
    n_windows passes of one mixed add per point (strip accumulation is the
    dominant term; bucket compaction/weighting adds ~25%)."""
    n = 1 << log2n
    adds = n_windows * n * 1.25
    t_sol = adds * U32_OPS_PER_MIXED_ADD / VPU_U32_OPS_PER_S
    return n / t_sol


def _rand_scalars_dev(fr, n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # uniform 16-bit limbs then clear top bits so scalars < 2^250 < r
    arr = rng.integers(0, 1 << 16, size=(fr.n, n), dtype=np.uint32)
    arr[-1] &= 0x03FF
    return jnp.asarray(arr)


def bench_msm(log2n: int):
    import jax

    from tpusnark.curves.batch_mul import FixedBaseMul, g1_generator_ladder
    from tpusnark.curves.jcurve import g1_ops
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FP, BN254_FR
    from tpusnark.msm.pippenger import get_msm

    n = 1 << log2n
    fp = get_field(BN254_FP)
    fr = get_field(BN254_FR)
    ops = g1_ops(fp)

    # generate n distinct affine points on device: t_i * G then normalize
    fb = FixedBaseMul(ops, fr, n_bits=64)
    ladder = g1_generator_ladder(fp, 64)
    tvals = _rand_scalars_dev(fr, n, seed=1)[:4]  # 64-bit scalars
    proj = fb(ladder, tvals)

    @jax.jit
    def normalize(pt):
        X, Y, Z = pt
        zi = fp.inv(Z)
        inf = fp.is_zero(Z)
        return fp.mul(X, zi), fp.mul(Y, zi), inf

    points = jax.block_until_ready(normalize(proj))

    scalars = _rand_scalars_dev(fr, n, seed=2)
    msm = get_msm("g1")
    out = jax.block_until_ready(msm(points, scalars))  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(msm(points, scalars))
    dt = (time.perf_counter() - t0) / reps
    pps = n / dt
    sol = msm_roofline(log2n, msm.c, msm.n_windows)
    return {
        "metric": f"bn254_g1_msm_2^{log2n}_points_per_s",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / REF_MSM_POINTS_PER_S, 3),
        # roofline: fraction of the kernel-structure speed-of-light on this
        # chip (VPU-bound; see msm_roofline). <1.0 gap = scheduling/gather
        # overhead; raising SOL itself needs fewer ops/add (MXU offload).
        "sol_points_per_s": round(sol, 1),
        "mfu_vs_sol": round(pps / sol, 3),
    }


def bench_ntt(log2n: int):
    import jax
    import jax.numpy as jnp

    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FR
    from tpusnark.poly.ntt import get_ntt

    n = 1 << log2n
    fr = get_field(BN254_FR)
    ntt = get_ntt(BN254_FR, n)
    x = _rand_scalars_dev(fr, n, seed=3)
    out = jax.block_until_ready(ntt.ntt(x))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(ntt.ntt(x))
    ms = (time.perf_counter() - t0) / reps * 1e3
    return {
        "metric": f"bn254_fr_ntt_2^{log2n}_ms",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(REF_NTT_2_22_MS / ms, 3) if log2n == 22 else 0.0,
    }


REF_GROTH16_2_20_S = 3.0  # gnark CPU Groth16 prove at 2^20 constraints, 16-core estimate


def bench_groth16(log2n: int):
    """End-to-end Groth16 prove wall-clock on a 2^log2n-constraint circuit
    (mul chain). Setup/compile excluded; solve included (like the reference's
    prover timer, backend/groth16/bn254/prove.go:319)."""
    import jax

    from tpusnark.backend import groth16
    from tpusnark.fields.spec import BN254_FR
    from tpusnark.frontend.builder import Builder

    p = BN254_FR.modulus
    n = (1 << log2n) - 8
    b = Builder(p)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for _ in range(n - 1):
        acc = b.mul(acc, x)
    b.assert_is_equal(b.add(acc, x, 5), y)
    cs = b.compile()
    assign = {"x": 3, "y": (pow(3, n, p) + 3 + 5) % p}
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(cs, pk, assign)  # compile + warm
    assert groth16.verify(proof, vk, [assign["y"]])
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        proof = groth16.prove(cs, pk, assign)
    dt = (time.perf_counter() - t0) / reps
    scale = (1 << 20) / (1 << log2n)
    return {
        "metric": f"groth16_prove_2^{log2n}_s",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(REF_GROTH16_2_20_S / (dt * scale), 3),
    }


def main():
    from tpusnark.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="msm", choices=["msm", "ntt", "groth16"])
    ap.add_argument("--n", type=int, default=None, help="log2 problem size")
    ap.add_argument("--smoke", action="store_true", help="small sizes, fast")
    args = ap.parse_args()
    if args.metric == "msm":
        out = bench_msm(args.n or (14 if args.smoke else 20))
    elif args.metric == "groth16":
        out = bench_groth16(args.n or (10 if args.smoke else 17))
    else:
        out = bench_ntt(args.n or (14 if args.smoke else 22))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
