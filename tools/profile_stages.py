"""Per-stage device timing for the encode/decode pipeline (diagnostic tool).

Times each pipeline stage with a forced 4-byte D2H dependency and SLOPE
timing between 2- and 10-dispatch passes (same methodology as
tools/roofline.py — through the axon tunnel both block_until_ready and
single-dispatch walls lie). Writes PROFILE_STAGES.json at the repo root.

Each stage runs in its OWN SUBPROCESS: measured r5, running all stages in
one process inflates later stages ~30x (decode_step 103 ms vs 2.9 ms clean
— the huge jnp-fallback stages' buffer pools/executables poison subsequent
allocations). The persistent compile cache keeps per-subprocess compile
cost at ~1-2 s warm.

Usage: python tools/profile_stages.py [F]            # all stages, isolated
       python tools/profile_stages.py [F] --only X   # one stage, in-process
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_NAMES = [
    "make_candidates", "autocorr_jnp", "levinson_jnp", "analyze_pallas",
    "deq+ref2lpc", "fir_fast_jnp", "rice_plan_jnp", "encode_step(all)",
    "encode_step(fus)", "fir_rice_kernel", "iir_pallas_fast",
    "iir_pallas_gen", "transpose_BN", "decode_step",
]


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1024
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    if only is None:
        # driver mode: one subprocess per stage, merge their JSON lines
        import json
        import subprocess

        rec = {"F": F, "stages": {}}
        for name in STAGE_NAMES:
            cmd = [sys.executable, os.path.abspath(__file__), str(F),
                   "--only", name]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=900)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if out.returncode != 0 or not line:
                print(f"{name}: FAILED\n{out.stderr[-400:]}", file=sys.stderr)
                rec["stages"][name] = {"error": out.stderr[-160:]}
                continue
            d = json.loads(line[-1])
            rec["stages"][name] = d[name]
            rec.setdefault("device", d.get("device"))
            print(f"{name:18s} {d[name]['ms']:8.2f} ms   "
                  f"{d[name]['pcm16_gbps']:6.2f} GB/s-equiv", file=sys.stderr)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE_STAGES.json")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {path}", file=sys.stderr)
        return

    import jax
    import jax.numpy as jnp

    from sela_tpu.bench import make_corpus
    from sela_tpu.codec.encoder import frame_batches
    from sela_tpu.codec.pipeline import decode_step, encode_step, make_candidates
    from sela_tpu.kernels.iir import iir_synthesize_pallas
    from sela_tpu.ops import analysis, coeffs, filters, rice
    from sela_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    left, right = make_corpus(120.0)
    x, n_valid = frame_batches([left, right])
    reps = -(-F // x.shape[0])
    if reps > 1:
        x = np.concatenate([x] * reps)
        n_valid = np.concatenate([n_valid] * reps)
    x, n_valid = x[:F], n_valid[:F]
    S = x.shape[-1]
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, chunk F={F} frames ({F*2*S*2/1e6:.1f} MB PCM)",
          file=sys.stderr)

    from sela_tpu.kernels.encode import analyze_pallas, fir_rice_pallas

    xd = jax.device_put(x)
    nvd = jax.device_put(n_valid)

    # Stage inputs built once via the FAST (Pallas) paths — running the jnp
    # fallbacks here would re-create the very state pollution the
    # per-subprocess isolation exists to avoid. B = F*4 candidate rows.
    cand = np.asarray(jax.jit(make_candidates)(xd))
    B = F * cand.shape[1]
    xb = jax.device_put(cand.reshape(B, S))
    nv = jax.device_put(np.repeat(n_valid, cand.shape[1]).astype(np.int32))

    ordr, q, _cost = analyze_pallas(xb, nv)
    c = jax.jit(lambda q, o: coeffs.reflection_to_lpc(
        coeffs.dequantize_reflection(q), o))(q, ordr)
    e, eff, _counts = fir_rice_pallas(xb, c, ordr, nv)
    for a in (ordr, q, c, e, eff):
        a.block_until_ready()

    def probe(f):
        @jax.jit
        def p(*args):
            out = f(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(l.sum().astype(jnp.float32) for l in leaves).astype(jnp.int32)
        return p

    stages = {
        "make_candidates": (probe(make_candidates), (xd,)),
        "autocorr_jnp": (probe(analysis.autocorr), (xb,)),
        "levinson_jnp": (probe(lambda r: analysis.levinson(r)),
                         (jax.jit(analysis.autocorr)(xb),)),
        "analyze_pallas": (probe(lambda a, n: analyze_pallas(a, n)), (xb, nv)),
        "deq+ref2lpc": (probe(lambda q, o: coeffs.reflection_to_lpc(
            coeffs.dequantize_reflection(q), o)), (q, ordr)),
        "fir_fast_jnp": (probe(lambda xb, c, o, nv: filters.fir_residues_fast(
            xb, c, o, nv)), (xb, c, ordr, nv)),
        "rice_plan_jnp": (probe(rice.plan_blocks), (e, nv)),
        "encode_step(all)": (probe(lambda x, n: encode_step.__wrapped__(x, n)),
                             (xd, nvd)),
        "encode_step(fus)": (probe(lambda x, n: encode_step.__wrapped__(
            x, n, fused=True)), (xd, nvd)),
        "fir_rice_kernel": (probe(lambda xb, c, o, nv: fir_rice_pallas(
            xb, c, o, nv)), (xb, c, ordr, nv)),
        "iir_pallas_fast": (probe(lambda e, c: iir_synthesize_pallas(
            e, c, fast=True)), (e[: F * 2], c[: F * 2])),
        "iir_pallas_gen": (probe(lambda e, c: iir_synthesize_pallas(
            e, c, fast=False)), (e[: F * 2], c[: F * 2])),
        "transpose_BN": (probe(lambda a: a.T + 1), (e[: F * 2],)),
        "decode_step": (probe(lambda r, q, o, t: decode_step.__wrapped__(
            r, q, o, t, iir="pallas")),
            (jax.device_put(np.asarray(e[: F * 2]).reshape(F, 2, S)),
             jax.device_put(np.asarray(q[: F * 2]).reshape(F, 2, -1)),
             jax.device_put(np.asarray(ordr[: F * 2]).reshape(F, 2)),
             jax.device_put(np.zeros((F, 2), np.int32)))),
    }
    stages = [(only, *stages[only])]

    # Slope timing (r5): a single-dispatch measurement reads ~30 ms through
    # the axon tunnel for EVERY stage — pure dispatch/fetch round-trip, zero
    # signal (an earlier run printed 24-68 ms for stages whose true costs
    # span 0.2-6.7 ms). Each stage is timed as the slope between a 2- and a
    # 10-dispatch async pass ending in one stacked-scalar fetch, which
    # cancels the constant round-trip exactly (same scheme as
    # tools/roofline.py).
    import json

    def slope(p, args, k1=2, k2=10):
        def one(k):
            deps = [p(*args) for _ in range(k)]
            return int(np.asarray(jnp.stack(deps).sum()))

        one(1)
        def best(k):
            b = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                one(k)
                b = min(b, time.perf_counter() - t0)
            return b

        return max(best(k2) - best(k1), 1e-9) / (k2 - k1)

    pcm_bytes = F * 2 * S * 2
    rec = {"device": dev.device_kind}
    for name, p, args in stages:
        int(np.asarray(p(*args)))  # compile + warm
        t = slope(p, args)
        rec[name] = {"ms": round(t * 1e3, 2),
                     "pcm16_gbps": round(pcm_bytes / t / 1e9, 2)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
