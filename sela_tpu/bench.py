"""Throughput benchmark: encode+decode GB/s per chip on a CD-audio corpus.

Protocol (BASELINE.json): synthetic stereo 16-bit 44.1 kHz music-like corpus,
framed into [F, 2, 2048] chunks; the jit'd device pipeline (encode_step then
decode_step) is timed after a compile warmup. The headline metric is
aggregate PCM bytes processed (encode pass + decode pass) divided by wall
time, per chip. Baseline denominator: the north-star target of 10 GB/s
aggregate on a v5p-16 = 0.625 GB/s/chip.

Only the final JSON line goes to stdout; diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_corpus(seconds: float, rate: int = 44100, seed: int = 0):
    """Music-like stereo int16 PCM: decaying chords + pink-ish noise floor."""
    n = int(seconds * rate)
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    sig = np.zeros(n)
    for f0, a in [(110.0, 0.3), (220.0, 0.25), (277.18, 0.2), (329.63, 0.15)]:
        # re-struck chord every 2 s with decay
        phase = 2 * np.pi * f0 * t
        env = np.exp(-(t % 2.0) * 1.5)
        sig += a * np.sin(phase) * env
    noise = rng.normal(0, 0.004, n)
    noise = np.cumsum(noise) * 0.15 + noise  # crude 1/f-ish floor
    left = np.clip((sig + noise) * 18000, -32767, 32767)
    right = np.clip((sig * 0.92 + np.roll(noise, 13)) * 18000, -32767, 32767)
    return (
        np.round(left).astype(np.int32),
        np.round(right).astype(np.int32),
    )


def run_bench(seconds: float = 60.0, engine: str = "jax",
              chunk_frames: int = 4096, iters: int = 5,
              n_chunks: int = 8) -> dict:
    """Timing methodology note: through the axon TPU tunnel,
    jax.block_until_ready() returns before the computation actually finishes
    (measured 59 "GB/s" for a 2048-step sequential scan — physically
    impossible). Every timed iteration therefore ends in a 4-byte
    device-to-host fetch of a scalar that data-depends on EVERY output of the
    step, which cannot complete early. All probe functions are compiled
    during warmup.
    """
    import jax
    import jax.numpy as jnp

    from .codec.encoder import frame_batches
    from .codec.pipeline import decode_step, encode_step
    from .utils.platform import enable_compile_cache

    enable_compile_cache()

    dev = jax.devices()[0]
    print(f"[bench] device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    left, right = make_corpus(seconds)
    x, n_valid = frame_batches([left, right])
    # n_chunks dispatches per timed pass: the host->device dispatch + final
    # sync round-trip amortizes over the pass instead of dominating it
    F = chunk_frames * n_chunks
    reps = -(-F // x.shape[0])
    if reps > 1:
        x = np.concatenate([x] * reps)[:F]
        n_valid = np.concatenate([n_valid] * reps)[:F]
    else:
        x, n_valid = x[:F], n_valid[:F]
    pcm_bytes_per_chunk = chunk_frames * 2 * 2048 * 2  # int16 source bytes

    iir = "pallas" if jax.default_backend() == "tpu" else "scan"
    fused = jax.default_backend() == "tpu"

    # All probes return ONLY a 4-byte scalar that data-depends on every
    # computed value: large jit outputs never cross the tunnel, and the
    # computation cannot be skipped or overlapped past the final fetch.
    @jax.jit
    def enc_probe(xc, nc):
        e = encode_step.__wrapped__(xc, nc, fused=fused)
        return (
            e["residues"].sum() + e["k_res"].sum() + e["nw_coeff"].sum()
            + e["sftype"].sum()
        ).astype(jnp.int32)

    @jax.jit
    def roundtrip_probe(xc, nc):
        e = encode_step.__wrapped__(xc, nc, fused=fused)
        pcm = decode_step.__wrapped__(
            e["residues"], e["qcoeffs"], e["order"], e["sftype"], iir=iir
        )
        S = xc.shape[-1]
        valid = jnp.arange(S)[None, None, :] < nc[:, None, None]
        exact = jnp.all(jnp.where(valid, pcm == xc, True))
        bits = (e["nw_res"].sum() + e["nw_coeff"].sum()) * 32
        return jnp.where(exact, bits, -1).astype(jnp.int32)

    xs = [jax.device_put(x[i : i + chunk_frames]) for i in range(0, F, chunk_frames)]
    nvs = [jax.device_put(n_valid[i : i + chunk_frames]) for i in range(0, F, chunk_frames)]

    @jax.jit
    def dec_probe(res, q, o, t):
        return decode_step.__wrapped__(res, q, o, t, iir=iir).sum().astype(jnp.int32)

    t0 = time.perf_counter()
    int(np.asarray(enc_probe(xs[0], nvs[0])))
    print(f"[bench] encode compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    rt = int(np.asarray(roundtrip_probe(xs[0], nvs[0])))
    print(f"[bench] roundtrip compile {time.perf_counter()-t0:.1f}s; "
          f"bit-exact={rt >= 0}", file=sys.stderr)
    if rt < 0:
        raise AssertionError("device roundtrip is not bit-exact")
    # materialize one chunk's encode outputs as decode-probe inputs (warmup,
    # not timed — large outputs cross the tunnel slowly)
    t0 = time.perf_counter()
    enc0 = encode_step(xs[0], nvs[0], fused=fused)
    dec_args = tuple(
        jax.device_put(np.asarray(enc0[k]))
        for k in ("residues", "qcoeffs", "order", "sftype")
    )
    int(np.asarray(dec_probe(*dec_args)))
    print(f"[bench] decode compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def timed(fn, args_list):
        """Min-of-iters pass time: async-dispatch every chunk, one D2H sync."""
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            deps = [fn(*a) for a in args_list]
            int(np.asarray(jnp.stack(deps).sum()))
            best = min(best, time.perf_counter() - t0)
        return best

    chunk_args = list(zip(xs, nvs))
    t_enc = timed(enc_probe, chunk_args)
    t_rt = timed(roundtrip_probe, chunk_args)
    t_dec = timed(dec_probe, [dec_args] * len(xs))

    total_pcm = pcm_bytes_per_chunk * len(xs)
    enc_gbps = total_pcm / t_enc / 1e9
    dec_gbps = total_pcm / t_dec / 1e9
    agg = 2 * total_pcm / t_rt / 1e9
    print(
        f"[bench] encode {enc_gbps:.3f} GB/s, decode {dec_gbps:.3f} GB/s, "
        f"aggregate {agg:.3f} GB/s over {total_pcm/1e6:.0f} MB PCM/pass",
        file=sys.stderr,
    )

    baseline = 0.625  # GB/s/chip: 10 GB/s north-star / 16 v5p chips
    result = {
        "metric": "encode+decode GB/s/chip (CD corpus, device pipeline)",
        "value": round(agg, 4),
        "unit": "GB/s",
        "vs_baseline": round(agg / baseline, 4),
        "detail": {
            "encode_gbps": round(enc_gbps, 4),
            "decode_gbps": round(dec_gbps, 4),
            "device": f"{dev.platform}:{dev.device_kind}",
            "chunk_frames": chunk_frames,
            "corpus_mb_per_pass": round(total_pcm / 1e6, 1),
        },
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    run_bench()
