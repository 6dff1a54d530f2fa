"""Speed-of-light accounting for the hot Pallas kernels (VERDICT r4 item 1).

Answers, with measured numbers committed to ROOFLINE.json:
  1. What is this chip's practical int32 VPU ceiling? (microbenchmarks:
     throughput-bound independent ops and latency-bound dependent chain)
  2. Where does each hot kernel sit against its own issue-count bound and
     against HBM bandwidth? (analytic ops/bytes per sample x measured time)
  3. Which (lanes, unroll) tile shape is fastest for the IIR fast kernel?
     (on-chip sweep; winners become kernels/iir.py defaults)

Usage:
    python tools/roofline.py            # full run, writes ROOFLINE.json
    python tools/roofline.py --quick    # skip the sweep

Timing uses the same forced-data-dependency scheme as sela_tpu/bench.py
(through the axon tunnel block_until_ready returns early; every timed
iteration ends in a 4-byte fetch that data-depends on every output).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 5


def _timed(probe, *args) -> float:
    """Min-of-REPEATS seconds for one probe() call (compiled beforehand)."""
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        int(np.asarray(probe(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def vpu_microbench():
    """Empirical int32 VPU ceilings via two Pallas microkernels.

    * throughput: T dependent iterations over a [ROWS, 128] tile of
      independent lanes/sublanes — each iteration is mul+add on ROWS*128
      int32 elements with abundant ILP (ROWS/8 independent registers), so
      the measured rate approaches the chip's int32 issue-rate bound.
    * latency: the same chain on a single [8, 128] register — every op
      depends on the previous one, so the rate measures per-op latency,
      the regime a non-pipelined sequential recurrence lives in.

    Through the axon tunnel every dispatch pays a ~30 ms round-trip floor
    (measured: a first cut with one T per probe returned identical wall
    times for 0.5 G and 8 M ops — pure dispatch latency). Each rate is
    therefore taken from the SLOPE between two iteration counts of the same
    kernel, which cancels the constant dispatch/fetch overhead exactly.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_probe(rows, T):
        def chain_kernel(x_ref, o_ref):
            a = jnp.int32(1103515245)
            b = jnp.int32(12345)

            def step(i, y):
                return y * a + b

            o_ref[:, :] = jax.lax.fori_loop(0, T, step, x_ref[:, :])

        @jax.jit
        def probe(xx):
            y = pl.pallas_call(
                chain_kernel,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(xx)
            return y.sum().astype(jnp.int32)

        return probe

    def slope_rate(rows, t1, t2):
        x = np.arange(rows * 128, dtype=np.int32).reshape(rows, 128)
        xd = jax.device_put(x)
        p1, p2 = make_probe(rows, t1), make_probe(rows, t2)
        int(np.asarray(p1(xd)))  # compile
        int(np.asarray(p2(xd)))
        d1, d2 = _timed(p1, xd), _timed(p2, xd)
        extra_ops = 2.0 * (t2 - t1) * rows * 128
        dt = max(d2 - d1, 1e-9)
        return extra_ops / dt, d1, d2

    tput, a1, a2 = slope_rate(512, 1 << 16, 1 << 19)  # issue-bound
    lat, b1, b2 = slope_rate(8, 1 << 20, 1 << 23)     # latency-bound
    return {
        "int32_tput_gops": round(tput / 1e9, 1),
        "int32_latency_chain_gops": round(lat / 1e9, 2),
        "issue_rate_ghz": round(tput / 2 / (8 * 128) / 1e9, 3),
        "dependent_issue_rate_ghz": round(lat / 2 / (8 * 128) / 1e9, 4),
        "raw_seconds": [round(v, 4) for v in (a1, a2, b1, b2)],
        "note": "tput = independent mul+add on [512,128] int32; latency = "
                "same chain on one [8,128] register (fully dependent); both "
                "slope-measured between two iteration counts to cancel the "
                "~30 ms tunnel dispatch floor",
    }


def _iir_inputs(B, N, seed=0):
    import jax
    import jax.numpy as jnp

    from sela_tpu.ops import analysis, coeffs

    rng = np.random.default_rng(seed)
    t = np.arange(B * N, dtype=np.float64).reshape(B, N)
    x = (9000 * np.sin(2 * np.pi * 0.007 * t)
         + rng.normal(0, 500, (B, N))).astype(np.int32)
    nv = jnp.full(B, N, jnp.int32)
    order, q = jax.jit(analysis.analyze)(jnp.asarray(x), nv)
    c = jax.jit(lambda q, o: coeffs.reflection_to_lpc(
        coeffs.dequantize_reflection(q), o))(q, order)
    e = rng.integers(-3000, 3000, (B, N)).astype(np.int32)
    return jax.device_put(e), jax.device_put(np.asarray(c))


def _slope_time(probe, args, k1=2, k2=10):
    """Per-dispatch seconds via the slope between k1- and k2-dispatch passes.

    A pass async-dispatches the probe k times and ends in ONE stacked-sum
    scalar fetch; (t_k2 - t_k1)/(k2 - k1) cancels the constant tunnel
    dispatch/fetch round-trip (~30 ms) that a single-dispatch measurement
    would count as kernel time.
    """
    import jax.numpy as jnp

    def one_pass(k):
        deps = [probe(*args) for _ in range(k)]
        return int(np.asarray(jnp.stack(deps).sum()))

    one_pass(1)  # warm
    t1 = min((lambda s: (one_pass(k1), time.perf_counter() - s)[1])(
        time.perf_counter()) for _ in range(REPEATS))
    t2 = min((lambda s: (one_pass(k2), time.perf_counter() - s)[1])(
        time.perf_counter()) for _ in range(REPEATS))
    return max(t2 - t1, 1e-9) / (k2 - k1)


def iir_sweep(B=8192, N=2048, lanes_list=(128, 256), unrolls=(1, 2, 4, 8)):
    """Time the fast IIR kernel across (lanes, unroll); return rows + winner.

    GB/s figures are PCM-16-bit-equivalent (2 bytes/sample), matching the
    bench headline convention; per-dispatch time is slope-measured (see
    _slope_time) so the tunnel round-trip does not pollute the comparison.
    """
    import jax
    import jax.numpy as jnp

    from sela_tpu.kernels.iir import iir_synthesize_pallas

    e, c = _iir_inputs(B, N)
    pcm = B * N * 2
    rows = []
    for lanes in lanes_list:
        for unroll in unrolls:
            @jax.jit
            def probe(ee, cc, lanes=lanes, unroll=unroll):
                y = iir_synthesize_pallas(ee, cc, fast=True, lanes=lanes,
                                          unroll=unroll)
                return y.sum().astype(jnp.int32)

            try:
                t0 = time.perf_counter()
                int(np.asarray(probe(e, c)))
                compile_s = time.perf_counter() - t0
                t = _slope_time(probe, (e, c))
            except Exception as exc:  # e.g. Mosaic dynamic-sublane-start
                # alignment: [32, 256] window loads need a provably 8-aligned
                # dim-0 start, which the per-step n+j offsets are not
                rows.append({"lanes": lanes, "unroll": unroll,
                             "error": str(exc).splitlines()[0][:160]})
                print(f"[sweep] iir lanes={lanes} unroll={unroll}: "
                      f"FAILED ({rows[-1]['error'][:60]})", file=sys.stderr)
                continue
            rows.append({
                "lanes": lanes, "unroll": unroll, "ms": round(t * 1e3, 2),
                "pcm16_gbps": round(pcm / t / 1e9, 3),
                "compile_s": round(compile_s, 1),
            })
            print(f"[sweep] iir lanes={lanes} unroll={unroll}: "
                  f"{t*1e3:.2f} ms = {pcm/t/1e9:.3f} GB/s-eq", file=sys.stderr)
    best = max((r for r in rows if "pcm16_gbps" in r),
               key=lambda r: r["pcm16_gbps"])
    return {"rows": rows, "best": best, "B": B, "N": N}


def iir_generic_time(B=8192, N=2048):
    import jax
    import jax.numpy as jnp

    from sela_tpu.kernels.iir import iir_synthesize_pallas

    e, c = _iir_inputs(B, N)
    pcm = B * N * 2

    @jax.jit
    def probe(ee, cc):
        return iir_synthesize_pallas(ee, cc, fast=False).sum().astype(jnp.int32)

    int(np.asarray(probe(e, c)))
    t = _slope_time(probe, (e, c))
    return {"ms": round(t * 1e3, 2), "pcm16_gbps": round(pcm / t / 1e9, 3)}


def encode_kernels_time(F=4096):
    """fir_rice + analyze fused kernels, same harness as tools/sweep_kernels."""
    import jax
    import jax.numpy as jnp

    from sela_tpu.bench import make_corpus
    from sela_tpu.codec.encoder import frame_batches
    from sela_tpu.kernels import encode as ke

    left, right = make_corpus(120.0)
    x, n_valid = frame_batches([left, right])
    reps = -(-F // x.shape[0])
    x = np.concatenate([x] * reps)[:F]
    n_valid = np.concatenate([n_valid] * reps)[:F]
    S = x.shape[-1]
    B = F * 4
    xb = jax.device_put(np.tile(x.reshape(F * 2, S), (2, 1))[:B])
    nv = jax.device_put(np.tile(n_valid.repeat(2), 2)[:B].astype(np.int32))

    from sela_tpu.ops import analysis, coeffs

    order, q = jax.jit(analysis.analyze)(xb, nv)
    c = jax.jit(lambda q, o: coeffs.reflection_to_lpc(
        coeffs.dequantize_reflection(q), o))(q, order)
    c.block_until_ready()

    out = {}
    pcm = B * S * 2

    @jax.jit
    def p_fir(a, cc, o, n):
        e, eo, counts = ke.fir_rice_pallas(a, cc, o, n)
        return (e.sum() + eo.sum() + counts.sum()).astype(jnp.int32)

    int(np.asarray(p_fir(xb, c, order, nv)))
    t = _slope_time(p_fir, (xb, c, order, nv))
    out["fir_rice"] = {"ms": round(t * 1e3, 2),
                       "pcm16_gbps": round(pcm / t / 1e9, 3)}

    @jax.jit
    def p_an(a, n):
        o, qq, cost = ke.analyze_pallas(a, n, 32)
        return (o.sum() + qq.sum() + cost.sum()).astype(jnp.int32)

    int(np.asarray(p_an(xb, nv)))
    t = _slope_time(p_an, (xb, nv))
    out["analyze"] = {"ms": round(t * 1e3, 2),
                      "pcm16_gbps": round(pcm / t / 1e9, 3)}
    return out


def analytic_model(vpu):
    """Issue-count model for the fast IIR kernel, per sample per 128 lanes.

    Counts 8x128-register VPU issues for one time step of one [*,128] tile:
      products  : 4 limb multiplies of [32,128]          = 4 * 4 = 16
      reduces   : 4 tree-reductions [32,128] -> [1,128]  = 4 * 6 = 24
                  (3 full-width adds to [8,128] + ~3 intra-register steps)
      epilogue  : ~12 ops on [1,128] (1/8-utilized registers)
      load/store: window slices + history/out writes     ~  6
    total ~= 58 issues per 128 samples. The issue-bound time for B rows and
    N samples is N * 58 * (B/128) / issue_rate; the HBM bound reads 8
    bytes/sample (4 in + 4 out) against ~819 GB/s (v5e spec) and is never
    the binding constraint — decode is a VPU/latency problem.
    """
    issues_per_step_tile = 16 + 24 + 12 + 6
    issue_rate = vpu["issue_rate_ghz"] * 1e9
    dep_rate = vpu["dependent_issue_rate_ghz"] * 1e9
    # PCM16-equivalent GB/s bounds for the kernel (2 bytes per sample,
    # 128 samples per tile-step):
    issue_bound = 128 * 2 * issue_rate / issues_per_step_tile
    latency_bound = 128 * 2 * dep_rate / issues_per_step_tile
    return {
        "iir_fast_issues_per_step_tile": issues_per_step_tile,
        "iir_fast_issue_bound_pcm16_gbps": round(issue_bound / 1e9, 2),
        "iir_fast_fully_dependent_bound_pcm16_gbps": round(
            latency_bound / 1e9, 2),
        "iir_fast_hbm_bound_pcm16_gbps": round(819 / 8 * 2, 0),
        "note": analytic_model.__doc__.strip().splitlines()[0],
        "calibration": (
            "measured r5: the unroll=4 kernel sustains ~2.5x this issue "
            "bound, i.e. Mosaic retires multiple modeled register-ops per "
            "cycle; the operative bound is the SERIAL DEPENDENCY CHAIN: "
            "~12 dependent ops/sample (limb split -> correction mul-add -> "
            "10-op rounding epilogue) x the measured ~2.6 ns dependent-op "
            "latency = ~31 ns/sample, vs 29 ns/sample achieved — >=95% of "
            "the recurrence speed-of-light. Direct proof: all-order-2, "
            "-12 and -30 batches time IDENTICALLY (3.8-4.0 ms at "
            "[8192,2048]), so tap work is fully latency-hidden; a "
            "tap-tier dispatch was built, measured 0% and removed "
            "(kernels/iir.py docstring). unroll=1->4 gained 1.3-1.5x; "
            "unroll=8 regresses."
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip the sweep")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ROOFLINE.json"))
    args = ap.parse_args()

    from sela_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax

    dev = jax.devices()[0]
    rec = {"device": f"{dev.platform}:{dev.device_kind}"}
    print(f"[roofline] device {rec['device']}", file=sys.stderr)

    rec["vpu"] = vpu_microbench()
    print(f"[roofline] vpu: {rec['vpu']}", file=sys.stderr)
    rec["model"] = analytic_model(rec["vpu"])
    print(f"[roofline] model: {rec['model']}", file=sys.stderr)

    if not args.quick:
        rec["iir_sweep"] = iir_sweep()
        rec["iir_generic"] = iir_generic_time()
        print(f"[roofline] generic i64 iir: {rec['iir_generic']}",
              file=sys.stderr)
        rec["encode_kernels"] = encode_kernels_time()
        print(f"[roofline] encode kernels: {rec['encode_kernels']}",
              file=sys.stderr)
        best = rec["iir_sweep"]["best"]
        bound = rec["model"]["iir_fast_issue_bound_pcm16_gbps"]
        rec["summary"] = {
            "iir_fast_best": best,
            "achieved_fraction_of_issue_bound": round(
                best["pcm16_gbps"] / bound, 3),
        }
        print(f"[roofline] summary: {rec['summary']}", file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"[roofline] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
