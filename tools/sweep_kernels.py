"""Sweep Pallas kernel tile sizes on the TPU (diagnostic tool).

Times the fused FIR+Rice kernel and the full encode probe for one
(SELA_FIR_ROWS, SELA_AC_ROWS) setting — run once per setting:
  SELA_FIR_ROWS=32 python tools/sweep_kernels.py 4096
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
    from sela_tpu.codec.pipeline import encode_step
    from sela_tpu.kernels import encode as ke
    from sela_tpu.ops import analysis, coeffs
    from sela_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    left, right = make_corpus(120.0)
    x, n_valid = frame_batches([left, right])
    reps = -(-F // x.shape[0])
    x = np.concatenate([x] * reps)[:F]
    n_valid = np.concatenate([n_valid] * reps)[:F]
    S = x.shape[-1]
    xd, nvd = jax.device_put(x), jax.device_put(n_valid)

    B = F * 4
    xb = jax.device_put(np.tile(x.reshape(F * 2, S), (2, 1))[:B])
    nv = jax.device_put(np.tile(n_valid.repeat(2), 2)[:B].astype(np.int32))
    ordr, q = jax.jit(analysis.analyze)(xb, nv)
    c = jax.jit(lambda q, o: coeffs.reflection_to_lpc(
        coeffs.dequantize_reflection(q), o))(q, ordr)
    c.block_until_ready()

    def probe(f):
        @jax.jit
        def p(*args):
            out = f(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(l.sum().astype(jnp.float32) for l in leaves).astype(jnp.int32)
        return p

    stages = [
        ("fir_rice", probe(lambda a, b, o, n: ke.fir_rice_pallas(a, b, o, n)),
         (xb, c, ordr, nv)),
        ("autocorr", probe(lambda a: ke.autocorr_pallas(a)), (xb,)),
        ("encode_step", probe(lambda a, n: encode_step.__wrapped__(
            a, n, fused=True)), (xd, nvd)),
    ]
    pcm = F * 2 * S * 2
    tag = f"FIR_ROWS={ke.ROWS} AC_ROWS={ke.ROWS_AC} F={F}"
    for name, p, args in stages:
        int(np.asarray(p(*args)))
        best = min(
            (lambda t0: (int(np.asarray(p(*args))), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(4)
        )
        print(f"[{tag}] {name:12s} {best*1e3:8.2f} ms  {pcm/best/1e9:5.2f} GB/s-eq",
              file=sys.stderr)


if __name__ == "__main__":
    main()
