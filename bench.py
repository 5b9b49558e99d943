"""North-star benchmarks on the real chip (BASELINE.md table).

Metric order puts the headline G1 MSM 2^20 FIRST (so a timeout later in the
suite can never lose the headline again — round 4's record was destroyed by
an unfinishable PLONK size running before it), then NTT 2^22, Groth16 e2e,
PLONK e2e; the headline MSM line is RE-EMITTED as the final JSON line
because the driver records the last line printed. Every metric is guarded
by try/except AND by a wall-clock budget check: when the elapsed time
crosses --budget seconds the remaining metrics emit explicit "skipped"
lines instead of risking an rc=124 kill.

vs_baseline compares against the reference's CPU prover stack
(gnark + gnark-crypto, /root/reference/backend/groth16/bn254/prove.go:201-290
and /root/reference/backend/plonk/bn254/prove.go:175). The reference repo
publishes no numbers (SURVEY.md §6) and no Go toolchain exists in this
image, so each REF_* constant is an ESTIMATE for a modern 16-core x86 host
and every JSON line carries "baseline_source": "estimate".

Groth16/PLONK lines carry a per-phase wall-clock breakdown ("phases") —
solve / H / MSMs / assembly for Groth16, solve / lro / z / quotient / open
for PLONK — mirroring the phase logs the reference emits (prove.go:319).

The MSM roofline is MEASURED, not modeled: we time a jit-chained fused
Montgomery-mul program on this chip at MSM batch widths (one dispatch, so
the rate reflects in-program kernel throughput, not tunnel dispatch), then
divide by the algorithm's mul count per point.

Usage: python bench.py [--metric msm|ntt|groth16|plonk|all] [--n LOG2]
                       [--smoke] [--budget SECONDS]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# --- reference CPU estimates (clearly labeled in output) ---------------------
# Pinned to public gnark-crypto/gnark figures where they exist:
#  * MSM: gnark-crypto BN254 G1 MultiExp 2^20 benchmarks on 16-core x86
#    commonly land at ~300-450 ms => ~2.6e6 points/s (docs.gnark.consensys.net
#    "gnark is fast"; not recorded in-repo, see BASELINE.md).
#  * NTT: fft.Domain 2^22 radix-2 on 16 cores ~120 ms.
#  * Groth16 2^20-constraint prove ~3 s; PLONK 2^14 ~1 s (same class of host).
REF_MSM_POINTS_PER_S = 2.6e6
REF_NTT_2_22_MS = 120.0
REF_GROTH16_2_20_S = 3.0
REF_PLONK_2_14_S = 1.0

BASELINE_SOURCE = "estimate"  # no in-repo numbers, no Go toolchain (SURVEY §6)

_T0 = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _rand_scalars_dev(fr, n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # uniform 16-bit limbs then clear top bits so scalars < 2^250 < r
    arr = rng.integers(0, 1 << 16, size=(fr.n, n), dtype=np.uint32)
    arr[-1] &= 0x03FF
    return jnp.asarray(arr)


def _measure_mul_rate(fp, lanes: int = 1 << 20, chain: int = 24) -> float:
    """Measured in-program throughput (field muls/s) of the fused Montgomery
    mul at MSM batch width: a single jitted program chains `chain` muls, so
    dispatch/tunnel latency amortizes away and the rate reflects what a
    compiled prover program actually gets per kernel."""
    import jax

    a = _rand_scalars_dev(fp, lanes, seed=11)
    b = _rand_scalars_dev(fp, lanes, seed=12)

    @jax.jit
    def chained(a, b):
        def body(_, o):
            return fp.mul(o, b)

        return jax.lax.fori_loop(0, chain, body, a)

    jax.block_until_ready(chained(a, b))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return chain * lanes / dt


def g1_ops_for(fp):
    from tpusnark.curves.jcurve import g1_ops

    return g1_ops(fp)


def bench_msm(log2n: int):
    import jax

    from tpusnark.curves.batch_mul import FixedBaseMul, g1_generator_ladder
    from tpusnark.fields.jfield import get_field
    from tpusnark.fields.spec import BN254_FP, BN254_FR
    from tpusnark.msm.pippenger import get_msm_for

    n = 1 << log2n
    fp = get_field(BN254_FP)
    fr = get_field(BN254_FR)

    # generate n distinct affine points on device: t_i * G then normalize
    fb = FixedBaseMul(g1_ops_for(fp), fr, n_bits=64)
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
    msm = get_msm_for("g1", n)
    out = jax.block_until_ready(msm(points, scalars))  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(msm(points, scalars))
    dt = (time.perf_counter() - t0) / reps
    pps = n / dt

    # measured roofline: ceiling of the CURRENT kernel+algorithm structure
    # from the in-program fused-mul rate on this chip
    mul_rate = _measure_mul_rate(fp)
    muls_per_pt = msm.muls_per_point_estimate()
    sol = mul_rate / muls_per_pt
    return {
        "metric": f"bn254_g1_msm_2^{log2n}_points_per_s",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / REF_MSM_POINTS_PER_S, 3),
        "baseline_source": BASELINE_SOURCE,
        "measured_mul_rate_per_s": round(mul_rate, 1),
        "sol_points_per_s": round(sol, 1),
        "mfu_vs_sol": round(pps / sol, 3),
    }


def bench_ntt(log2n: int):
    import jax

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
        "baseline_source": BASELINE_SOURCE,
    }


def bench_groth16(log2n: int):
    """End-to-end Groth16 prove wall-clock on a 2^log2n-constraint circuit
    (mul chain). Setup/compile excluded; solve included (like the reference's
    prover timer, backend/groth16/bn254/prove.go:319). Emits a per-phase
    breakdown (solve / encode / h / msm / assemble)."""
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
    phases: dict = {}
    t0 = time.perf_counter()
    for _ in range(reps):
        proof = groth16.prove(cs, pk, assign, timings=phases)
    dt = (time.perf_counter() - t0) / reps
    scale = (1 << 20) / (1 << log2n)
    return {
        "metric": f"groth16_prove_2^{log2n}_s",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(REF_GROTH16_2_20_S / (dt * scale), 3),
        "baseline_source": BASELINE_SOURCE,
        "phases": {k: round(v / reps, 3) for k, v in phases.items()},
    }


def bench_plonk(log2n: int):
    """End-to-end PLONK prove wall-clock on a ~2^log2n-gate circuit
    (mul chain through the SCS builder; exercises NTT/quotient/KZG opening —
    the reference's timer is backend/plonk/bn254/prove.go:116-177). Emits a
    per-phase breakdown (solve / lro / z / quotient / open)."""
    from tpusnark.backend import plonk
    from tpusnark.fields.spec import BN254_FR
    from tpusnark.frontend.plonk_builder import PlonkBuilder

    p = BN254_FR.modulus
    n = (1 << log2n) - 16  # leave room for wiring/public rows
    b = PlonkBuilder(p)
    x = b.secret("x")
    y = b.public("y")
    acc = x
    for i in range(n):
        # alternate add/mul so gate CSE can't collapse the chain
        acc = b.mul(acc, x) if i % 2 == 0 else b.add(acc, x)
    b.assert_is_equal(acc, y)
    cs = b.compile()
    xv = 3
    av = xv
    for i in range(n):
        av = av * xv % p if i % 2 == 0 else (av + xv) % p
    assign = {"x": xv, "y": av}
    pk, vk = plonk.setup(cs)
    proof = plonk.prove(cs, pk, assign)  # compile + warm
    assert plonk.verify(proof, vk, [assign["y"]])
    reps = 2
    phases: dict = {}
    t0 = time.perf_counter()
    for _ in range(reps):
        proof = plonk.prove(cs, pk, assign, timings=phases)
    dt = (time.perf_counter() - t0) / reps
    scale = (1 << 14) / (1 << log2n)
    return {
        "metric": f"plonk_prove_2^{log2n}_s",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(REF_PLONK_2_14_S / (dt * scale), 3),
        "baseline_source": BASELINE_SOURCE,
        "phases": {k: round(v / reps, 3) for k, v in phases.items()},
    }


def main():
    from tpusnark.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--metric", default="all", choices=["all", "msm", "ntt", "groth16", "plonk"]
    )
    ap.add_argument("--n", type=int, default=None, help="log2 problem size")
    ap.add_argument("--smoke", action="store_true", help="small sizes, fast")
    ap.add_argument(
        "--budget",
        type=float,
        default=1100.0,
        help="wall-clock budget (s); later metrics are skipped, not killed",
    )
    args = ap.parse_args()
    sm = args.smoke
    # headline FIRST; sizes reflect measured reality on this chip
    runs = {
        "msm": (bench_msm, args.n or (14 if sm else 20)),
        "ntt": (bench_ntt, args.n or (14 if sm else 22)),
        "groth16": (bench_groth16, args.n or (10 if sm else 17)),
        "plonk": (bench_plonk, args.n or (8 if sm else 14)),
    }
    if args.metric != "all":
        runs = {args.metric: runs[args.metric]}
    headline = None
    for name, (fn, size) in runs.items():
        if _elapsed() > args.budget:
            print(
                json.dumps(
                    {
                        "metric": f"{name}_2^{size}",
                        "value": None,
                        "unit": "skipped",
                        "vs_baseline": 0.0,
                        "skipped": True,
                        "reason": f"budget {args.budget:.0f}s exceeded "
                        f"(elapsed {_elapsed():.0f}s)",
                    }
                ),
                flush=True,
            )
            continue
        try:
            rec = fn(size)
            rec["elapsed_s"] = round(_elapsed(), 1)
            print(json.dumps(rec), flush=True)
            if name == "msm":
                headline = rec
        except Exception as e:  # one metric failing must not zero the report
            msg = f"{type(e).__name__}: {e}"
            print(
                json.dumps(
                    {
                        "metric": f"{name}_2^{size}",
                        "value": None,
                        "unit": "error",
                        "vs_baseline": 0.0,
                        "error": msg[:400],
                    }
                ),
                flush=True,
            )
    # the driver records the FINAL json line: re-emit the headline MSM
    if headline is not None and args.metric == "all":
        print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
