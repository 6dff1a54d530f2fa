"""Per-stage device timing for the encode/decode pipeline (diagnostic tool).

Times each pipeline stage in isolation with a forced 4-byte D2H dependency
(same methodology as sela_tpu/bench.py — block_until_ready alone lies through
the axon tunnel). Prints a table to stderr; not part of the test suite.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sela_tpu.bench import make_corpus
    from sela_tpu.codec.encoder import frame_batches
    from sela_tpu.codec.pipeline import decode_step, encode_step, make_candidates
    from sela_tpu.kernels.iir import iir_synthesize_pallas
    from sela_tpu.ops import analysis, coeffs, filters, rice
    from sela_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
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

    xd = jax.device_put(x)
    nvd = jax.device_put(n_valid)

    # Stage inputs built once (encode path shapes: B = F*4 candidates)
    cand = np.asarray(jax.jit(make_candidates)(xd))
    B = F * cand.shape[1]
    xb = jax.device_put(cand.reshape(B, S))
    nv = jax.device_put(np.repeat(n_valid, cand.shape[1]).astype(np.int32))

    ordr, q = jax.jit(analysis.analyze)(xb, nv)
    g = jax.jit(coeffs.dequantize_reflection)(q)
    c = jax.jit(lambda g, o: coeffs.reflection_to_lpc(g, o))(g, ordr)
    e, eff = jax.jit(filters.fir_residues_fast)(xb, c, ordr, nv)
    for a in (ordr, q, g, c, e, eff):
        a.block_until_ready()

    def probe(f):
        @jax.jit
        def p(*args):
            out = f(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(l.sum().astype(jnp.float32) for l in leaves).astype(jnp.int32)
        return p

    stages = [
        ("make_candidates", probe(make_candidates), (xd,)),
        ("autocorr", probe(analysis.autocorr), (xb,)),
        ("levinson", probe(lambda r: analysis.levinson(r)), (jax.jit(analysis.autocorr)(xb),)),
        ("analyze(full)", probe(analysis.analyze), (xb, nv)),
        ("deq+ref2lpc", probe(lambda q, o: coeffs.reflection_to_lpc(
            coeffs.dequantize_reflection(q), o)), (q, ordr)),
        ("fir_fast", probe(lambda xb, c, o, nv: filters.fir_residues_fast(xb, c, o, nv)),
         (xb, c, ordr, nv)),
        ("rice_plan(res)", probe(rice.plan_blocks), (e, nv)),
        ("encode_step(all)", probe(lambda x, n: encode_step.__wrapped__(x, n)), (xd, nvd)),
        ("encode_step(fus)", probe(lambda x, n: encode_step.__wrapped__(
            x, n, fused=True)), (xd, nvd)),
        ("fir_rice_kernel", probe(lambda xb, c, o, nv: __import__(
            "sela_tpu.kernels.encode", fromlist=["fir_rice_pallas"]
        ).fir_rice_pallas(xb, c, o, nv)), (xb, c, ordr, nv)),
        ("iir_pallas_fast", probe(lambda e, c: iir_synthesize_pallas(e, c, fast=True)),
         (e[: F * 2], c[: F * 2])),
        ("iir_pallas_gen", probe(lambda e, c: iir_synthesize_pallas(e, c, fast=False)),
         (e[: F * 2], c[: F * 2])),
        ("transpose_BN", probe(lambda a: a.T + 1), (e[: F * 2],)),
        ("decode_step", probe(lambda r, q, o, t: decode_step.__wrapped__(
            r, q, o, t, iir="pallas")),
         (jax.device_put(np.asarray(e[: F * 2]).reshape(F, 2, S)),
          jax.device_put(np.asarray(q[: F * 2]).reshape(F, 2, -1)),
          jax.device_put(np.asarray(ordr[: F * 2]).reshape(F, 2)),
          jax.device_put(np.zeros((F, 2), np.int32)))),
        ("zigzag+cumk", probe(lambda v, n: rice.plan_blocks(v, n)[:2]),
         (e, nv)),
    ]

    pcm_bytes = F * 2 * S * 2
    for name, p, args in stages:
        int(np.asarray(p(*args)))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            int(np.asarray(p(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:18s} {best*1e3:8.2f} ms   {pcm_bytes/best/1e9:6.2f} GB/s-equiv",
              file=sys.stderr)


if __name__ == "__main__":
    main()
