"""Throughput benchmark: device pipeline AND end-to-end codec GB/s per chip.

Reports BOTH (VERDICT r1 item 1):
  * device-pipeline GB/s (headline `value`) — the full codec math
    (analysis + render + rice planning + decode) as jit'd XLA programs on
    the chip, the number that tracks kernel quality round over round;
  * end-to-end GB/s + compression ratio (`detail.e2e_*`) — WAV PCM bytes ->
    `.sela` container bytes and back, including host Rice packing,
    container emit/scan, and every host<->device transfer.

SANDBOX CAVEAT (measured, recorded in `detail.io_tunnel`): this environment
reaches its one TPU through the `axon` network tunnel, where D2H runs at
~20 MB/s and H2D at ~40-110 MB/s — three orders of magnitude below the PCIe
link of a real TPU host — and the host has 2 CPU cores. The e2e numbers
here are therefore a measurement of the tunnel, not the codec: at 21 MB/s
D2H, fetching one 8.4 MB chunk of residues alone costs 0.4 s that would be
~0.5 ms over PCIe. On production hardware the e2e path is bounded by the
device pipeline + host pack (127 MB-PCM/s per 2 cores, trivially threaded),
which is why both numbers are reported separately rather than letting the
tunnel mask kernel regressions.

BASELINE configs measured e2e: #2 stereo CD 16/44.1 (also device pipeline),
#3 64 heterogeneous files (codec.corpus batch path), #4 24-bit/96k hi-res
(limb-kernel domain), plus 32-bit PCM (pallas_generic domain). Every config
asserts a bit-exact round trip on the bench device before its numbers are
reported.

Only the final JSON line goes to stdout; diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_corpus(seconds: float, rate: int = 44100, seed: int = 0,
                bits: int = 16):
    """Music-like stereo int PCM: decaying chords + pink-ish noise floor."""
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
    amp = (1 << (bits - 1)) * 0.55
    lim = (1 << (bits - 1)) - 1
    left = np.clip((sig + noise) * amp, -lim, lim)
    right = np.clip((sig * 0.92 + np.roll(noise, 13)) * amp, -lim, lim)
    return (
        np.round(left).astype(np.int64).astype(np.int32),
        np.round(right).astype(np.int64).astype(np.int32),
    )


def _timed_min(fn, iters: int):
    best = float("inf")
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def _assert_equal_wav(w, out, label: str):
    assert out.sample_rate == w.sample_rate, label
    assert out.bits_per_sample == w.bits_per_sample, label
    for a, b in zip(out.channels, w.channels):
        np.testing.assert_array_equal(a, b, err_msg=label)


def bench_e2e(w, iters: int = 3, label: str = "e2e") -> dict:
    """Full-codec timing: WavData -> container bytes -> WavData, host included.

    Timing is host-wall by construction (the container bytes / PCM arrays
    materialize on the host each iteration — no async-dispatch escape, unlike
    block_until_ready through the axon tunnel).
    """
    from .codec.decoder import decode_sela
    from .codec.encoder import encode_wav

    pcm_bytes = w.n_samples * w.n_channels * w.bits_per_sample // 8

    buf = encode_wav(w)  # warmup/compile
    t_enc, buf = _timed_min(lambda: encode_wav(w), iters)
    out = decode_sela(buf)  # warmup/compile
    t_dec, out = _timed_min(lambda: decode_sela(buf), iters)
    _assert_equal_wav(w, out, label)

    enc = pcm_bytes / t_enc / 1e9
    dec = pcm_bytes / t_dec / 1e9
    agg = 2 * pcm_bytes / (t_enc + t_dec) / 1e9
    ratio = len(buf) / pcm_bytes
    print(f"[bench] {label}: encode {enc:.3f} GB/s, decode {dec:.3f} GB/s, "
          f"aggregate {agg:.3f} GB/s, ratio {ratio:.4f} "
          f"({pcm_bytes/1e6:.0f} MB PCM)", file=sys.stderr)
    return {
        "encode_gbps": round(enc, 4),
        "decode_gbps": round(dec, 4),
        "aggregate_gbps": round(agg, 4),
        "compression_ratio": round(ratio, 4),
        "pcm_mb": round(pcm_bytes / 1e6, 1),
        "bit_exact": True,
    }


def bench_batch64(seconds_total: float = 64.0, iters: int = 2) -> dict:
    """BASELINE config #3: 64 heterogeneous files, one chip, batch codec."""
    from .codec.corpus import decode_files, encode_files
    from .ref.wav import WavData

    rng = np.random.default_rng(11)
    wavs = []
    for i in range(64):
        secs = float(rng.uniform(0.3, 2.0))
        rate = int(rng.choice([22050, 44100, 48000]))
        bits = int(rng.choice([16, 16, 24]))
        nch = int(rng.choice([1, 2]))
        left, right = make_corpus(secs, rate=rate, seed=100 + i, bits=bits)
        chans = [left] if nch == 1 else [left, right]
        wavs.append(WavData(rate, bits, chans))
    pcm_bytes = sum(
        w.n_samples * w.n_channels * w.bits_per_sample // 8 for w in wavs
    )

    bufs = encode_files(wavs)  # warmup/compile
    t_enc, bufs = _timed_min(lambda: encode_files(wavs), iters)
    outs = decode_files(bufs)  # warmup/compile
    t_dec, outs = _timed_min(lambda: decode_files(bufs), iters)
    for w, out in zip(wavs, outs):
        _assert_equal_wav(w, out, "batch64")

    enc = pcm_bytes / t_enc / 1e9
    dec = pcm_bytes / t_dec / 1e9
    ratio = sum(len(b) for b in bufs) / pcm_bytes
    print(f"[bench] batch64: encode {enc:.3f} GB/s, decode {dec:.3f} GB/s, "
          f"ratio {ratio:.4f} ({pcm_bytes/1e6:.0f} MB PCM, 64 files)",
          file=sys.stderr)
    return {
        "encode_gbps": round(enc, 4),
        "decode_gbps": round(dec, 4),
        "aggregate_gbps": round(2 * pcm_bytes / (t_enc + t_dec) / 1e9, 4),
        "compression_ratio": round(ratio, 4),
        "pcm_mb": round(pcm_bytes / 1e6, 1),
        "n_files": 64,
        "bit_exact": True,
    }


def bench_host_pack(n_blocks: int = 4096, n_vals: int = 2048,
                    iters: int = 3) -> dict:
    """Host Rice pack/unpack throughput (native C++ path, PCM16-equivalent).

    On real TPU hosts (PCIe link, many cores) the host packer is the e2e
    encode ceiling, so its rate is tracked per round as a gated metric
    (VERDICT r4 item 3). Values are Laplacian residues at a music-like
    scale; k per block is the exact optimum so the bit mix matches real
    streams.
    """
    from .ref.rice import optimal_k
    from .utils.bitpack import _native

    rng = np.random.default_rng(5)
    vals = np.round(rng.laplace(0, 300, n_blocks * n_vals)).astype(np.int32)
    offs = (np.arange(n_blocks, dtype=np.int64)) * n_vals
    counts = np.full(n_blocks, n_vals, np.int32)
    # exact per-block optimal k, computed once on a vectorized zigzag
    u = ((vals << 1) ^ (vals >> 31)).astype(np.uint32).astype(np.int64)
    ub = u.reshape(n_blocks, n_vals)
    ks = np.zeros(n_blocks, np.int32)
    costs = np.full(n_blocks, 1 << 62, np.int64)
    for k in range(0, 20):
        c = (ub >> k).sum(axis=1) + (k + 1) * n_vals
        better = c < costs
        ks[better] = k
        costs[better] = c[better]

    if _native is None or not _native.available():  # pragma: no cover
        return {"note": "native bitio not built; host pack not measured"}
    from .native import bitio as nat

    pcm_mb = n_blocks * n_vals * 2 / 1e6
    t_pack, (words, wcounts) = _timed_min(
        lambda: nat.pack_blocks_flat(vals, offs, counts, ks), iters)
    woffs = np.zeros(n_blocks, np.int64)
    np.cumsum(wcounts[:-1], out=woffs[1:])
    t_unpack, out = _timed_min(
        lambda: nat.unpack_blocks_flat(words, woffs, wcounts.astype(np.int32),
                                       counts, ks), iters)
    np.testing.assert_array_equal(out, vals)
    import os as _os

    rec = {
        "pack_mb_per_s": round(pcm_mb / t_pack, 1),
        "unpack_mb_per_s": round(pcm_mb / t_unpack, 1),
        "pcm_mb": round(pcm_mb, 1),
        "host_cores": _os.cpu_count(),
    }
    print(f"[bench] host pack {rec['pack_mb_per_s']} MB-PCM/s, unpack "
          f"{rec['unpack_mb_per_s']} MB-PCM/s ({_os.cpu_count()} cores)",
          file=sys.stderr)
    return rec


def bench_device_pack(n_blocks: int = 8192, n_vals: int = 2048,
                      iters: int = 3) -> dict:
    """A/B: the on-device two-phase Rice packer (ops/pack.py) vs host pack.

    Slope-timed between 2- and 10-dispatch passes so the tunnel round-trip
    (~30 ms/dispatch here, ~us on a real PCIe host) cancels; byte-equality
    vs the host packer is asserted on a sample before timing. The recorded
    pair is the measurement VERDICT r4 item 3 asked for — the encode path
    keeps whichever side wins on the deployment host (see ops/rice.py).
    """
    import jax
    import jax.numpy as jnp

    from .ops.pack import pack_blocks_reference_shapes
    from .ref.rice import optimal_k
    from .utils.bitpack import pack_blocks

    rng = np.random.default_rng(5)
    vals = np.round(
        rng.laplace(0, 300, (n_blocks, n_vals))).astype(np.int32)
    nv = np.full(n_blocks, n_vals, np.int32)
    u = ((vals.astype(np.int64) << 1) ^ (vals >> 31)).astype(np.int64)
    ks = np.zeros(n_blocks, np.int32)
    costs = np.full(n_blocks, 1 << 62, np.int64)
    for k in range(0, 20):
        c = (u >> k).sum(axis=1) + (k + 1) * n_vals
        better = c < costs
        ks[better] = k
        costs[better] = c[better]
    max_words = int((costs.max() + 31) // 32 + 1)
    max_words = -(-max_words // 8) * 8  # sublane-friendly

    vd = jax.device_put(vals)
    kd = jax.device_put(ks)
    nd = jax.device_put(nv)

    @jax.jit
    def probe(v, k, n):
        w, nw = pack_blocks_reference_shapes(v, k, n, max_words)
        return (w.astype(jnp.int32).sum() + nw.sum()).astype(jnp.int32)

    int(np.asarray(probe(vd, kd, nd)))  # compile
    # byte-equality vs the host packer on a 64-block sample
    import jax as _jax

    w_dev, nw_dev = _jax.jit(
        pack_blocks_reference_shapes, static_argnums=3
    )(vd, kd, nd, max_words)
    w_dev = np.asarray(w_dev[:64])
    nw_dev = np.asarray(nw_dev[:64])
    host_words = pack_blocks([(vals[b], int(ks[b])) for b in range(64)])
    for b in range(64):
        assert nw_dev[b] == len(host_words[b]), b
        np.testing.assert_array_equal(w_dev[b, : nw_dev[b]], host_words[b])

    def one_pass(kk):
        deps = [probe(vd, kd, nd) for _ in range(kk)]
        return int(np.asarray(jnp.stack(deps).sum()))

    def best_pass(kk):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            one_pass(kk)
            best = min(best, time.perf_counter() - t0)
        return best

    t = max(best_pass(10) - best_pass(2), 1e-9) / 8
    pcm_mb = n_blocks * n_vals * 2 / 1e6
    rec = {
        "device_pack_mb_per_s": round(pcm_mb / t, 1),
        "pcm_mb": round(pcm_mb, 1),
        "byte_exact_vs_host": True,
    }
    print(f"[bench] device pack {rec['device_pack_mb_per_s']} MB-PCM/s "
          f"(slope-timed, byte-exact vs host packer)", file=sys.stderr)
    return rec


def bench_device_pipeline(seconds: float, chunk_frames: int, iters: int,
                          n_chunks: int, bits: int = 16,
                          label: str = "device pipeline",
                          measure_compile: bool = True) -> dict:
    """Device-only pipeline numbers (r1 headline, kept for kernel tracking).

    Timing methodology note: through the axon TPU tunnel,
    jax.block_until_ready() returns before the computation actually finishes
    (measured 59 "GB/s" for a 2048-step sequential scan — physically
    impossible). Every timed iteration therefore ends in a 4-byte
    device-to-host fetch of a scalar that data-depends on EVERY output of the
    step, which cannot complete early. All probe functions are compiled
    during warmup.

    bits selects the kernel domain (VERDICT r4 item 4): 16 = CD headline
    (limb kernels + mid/side), 24 = hi-res limb domain, 32 = generic-i64
    domain (no mid/side, pallas_generic IIR). Every domain asserts
    bit-exactness in-probe before its numbers are reported.
    """
    import jax
    import jax.numpy as jnp

    from .codec.encoder import frame_batches
    from .codec.pipeline import decode_step, encode_step

    left, right = make_corpus(seconds, bits=bits)
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
    pcm_bytes_per_chunk = chunk_frames * 2 * 2048 * (bits // 8)

    on_tpu = jax.default_backend() == "tpu"
    allow_ms = bits <= 24
    fused = on_tpu and allow_ms  # 32-bit measured faster all-jnp: see
    #                              codec.pipeline.default_fused docstring
    if on_tpu:
        iir = "pallas" if bits <= 24 else "pallas_generic"
    else:
        iir = "scan"

    # All probes return ONLY a 4-byte scalar that data-depends on every
    # computed value: large jit outputs never cross the tunnel, and the
    # computation cannot be skipped or overlapped past the final fetch.
    def make_enc_probe():
        @jax.jit
        def enc_probe(xc, nc):
            e = encode_step.__wrapped__(xc, nc, allow_ms=allow_ms, fused=fused)
            return (
                e["residues"].sum() + e["k_res"].sum() + e["nw_coeff"].sum()
                + e["sftype"].sum()
            ).astype(jnp.int32)

        return enc_probe

    @jax.jit
    def roundtrip_probe(xc, nc):
        e = encode_step.__wrapped__(xc, nc, allow_ms=allow_ms, fused=fused)
        pcm = decode_step.__wrapped__(
            e["residues"], e["qcoeffs"], e["order"], e["sftype"], iir=iir
        )
        S = xc.shape[-1]
        valid = jnp.arange(S)[None, None, :] < nc[:, None, None]
        exact = jnp.all(jnp.where(valid, pcm == xc, True))
        bits_dep = (e["nw_res"].sum() + e["nw_coeff"].sum()) * 32
        return jnp.where(exact, bits_dep, -1).astype(jnp.int32)

    xs = [jax.device_put(x[i : i + chunk_frames]) for i in range(0, F, chunk_frames)]
    nvs = [jax.device_put(n_valid[i : i + chunk_frames]) for i in range(0, F, chunk_frames)]

    @jax.jit
    def dec_probe(res, q, o, t):
        return decode_step.__wrapped__(res, q, o, t, iir=iir).sum().astype(jnp.int32)

    compile_rec = {}
    if measure_compile:
        # COLD compile: point the persistent cache at a throwaway dir so the
        # number means "first compile on a fresh machine" regardless of what
        # earlier rounds left in .jax_cache; then recompile a fresh jit
        # wrapper of the same function against the real cache dir for the
        # WARM number (a disk hit after any prior bench run on this volume).
        # VERDICT r4 item 5: the two regimes were previously conflated.
        import tempfile

        persistent = jax.config.jax_compilation_cache_dir
        cold_dir = tempfile.mkdtemp(prefix="sela_coldcache_")
        jax.config.update("jax_compilation_cache_dir", cold_dir)
        p_cold = make_enc_probe()
        t0 = time.perf_counter()
        int(np.asarray(p_cold(xs[0], nvs[0])))
        compile_rec["encode_compile_cold_s"] = round(
            time.perf_counter() - t0, 1)
        jax.config.update("jax_compilation_cache_dir", persistent)
        enc_probe = make_enc_probe()
        t0 = time.perf_counter()
        int(np.asarray(enc_probe(xs[0], nvs[0])))
        compile_rec["encode_compile_warm_s"] = round(
            time.perf_counter() - t0, 1)
        enc_compile_s = compile_rec["encode_compile_cold_s"]
        print(f"[bench] encode compile cold {enc_compile_s:.1f}s, warm "
              f"{compile_rec['encode_compile_warm_s']:.1f}s", file=sys.stderr)
    else:
        enc_probe = make_enc_probe()
        t0 = time.perf_counter()
        int(np.asarray(enc_probe(xs[0], nvs[0])))
        enc_compile_s = time.perf_counter() - t0
        print(f"[bench] {label} encode compile {enc_compile_s:.1f}s",
              file=sys.stderr)
    t0 = time.perf_counter()
    rt = int(np.asarray(roundtrip_probe(xs[0], nvs[0])))
    print(f"[bench] roundtrip compile {time.perf_counter()-t0:.1f}s; "
          f"bit-exact={rt >= 0}", file=sys.stderr)
    if rt < 0:
        raise AssertionError("device roundtrip is not bit-exact")
    # synthetic decode-probe inputs, built host-side: same shapes/dtypes as
    # real encode outputs, so decode timing is identical, but nothing big
    # crosses the tunnel and no extra encode executable is compiled (the r2
    # bench's "decode compile 59s" was mostly a standalone encode_step
    # compile + a 67 MB residue fetch; decode correctness is already covered
    # by roundtrip_probe's in-graph bit-exactness assert above)
    rng = np.random.default_rng(7)
    S = x.shape[-1]
    res_amp = 3000 if bits <= 16 else (1 << (bits - 5))
    # realistic per-channel order mix (measured on the encoded bench corpus
    # under the r5 order model: mid channels ~1-3, side channels ~24-30) so
    # the decode probe exercises the IIR tier dispatch the way real streams
    # do, instead of uniform-random orders no stream produces
    dec_orders = np.stack([
        rng.integers(1, 4, chunk_frames), rng.integers(24, 31, chunk_frames)
    ], axis=1).astype(np.int32)
    dec_args = tuple(jax.device_put(a) for a in (
        rng.integers(-res_amp, res_amp, (chunk_frames, 2, S)).astype(np.int32),
        rng.integers(-60, 60, (chunk_frames, 2, 32)).astype(np.int32),
        dec_orders,
        np.zeros((chunk_frames, 2), np.int32),
    ))
    t0 = time.perf_counter()
    int(np.asarray(dec_probe(*dec_args)))
    print(f"[bench] {label} decode compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

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
    # the headline aggregate times a FUSED encode->decode graph, which XLA
    # overlaps better than separate jobs would (VERDICT r4 weak 7); the
    # separate-pass figure below is the conservative number a pipeline of
    # independent encode and decode jobs would see
    agg_sep = 2 * total_pcm / (t_enc + t_dec) / 1e9
    print(
        f"[bench] {label}: encode {enc_gbps:.3f} GB/s, decode "
        f"{dec_gbps:.3f} GB/s, aggregate {agg:.3f} GB/s over "
        f"{total_pcm/1e6:.0f} MB PCM/pass",
        file=sys.stderr,
    )
    return {
        "encode_gbps": round(enc_gbps, 4),
        "decode_gbps": round(dec_gbps, 4),
        "aggregate_gbps": round(agg, 4),
        "aggregate_separate_gbps": round(agg_sep, 4),
        "encode_compile_s": round(enc_compile_s, 1),
        **compile_rec,
        "chunk_frames": chunk_frames,
        "corpus_mb_per_pass": round(total_pcm / 1e6, 1),
    }


def run_bench(seconds: float = 300.0, engine: str = "jax",
              chunk_frames: int = 4096, iters: int = 5,
              n_chunks: int = 8, e2e_iters: int = 3) -> dict:
    import os

    from .utils.platform import enable_compile_cache, respect_platform_env

    respect_platform_env()

    import jax

    from .ref.wav import WavData

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"[bench] device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    # measure the host<->device link so the e2e numbers are interpretable
    # (through the axon tunnel this is ~100-1000x slower than real PCIe)
    probe = np.zeros(8 * 1024 * 1024 // 4, np.int32)
    xd = jax.device_put(probe)
    xd.block_until_ready()
    np.asarray(xd)  # warm the D2H path
    t0 = time.perf_counter()
    xd2 = jax.device_put(probe)
    xd2.block_until_ready()
    h2d = 8 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(xd2)
    d2h = 8 / (time.perf_counter() - t0)
    io_tunnel = {"h2d_mb_per_s": round(h2d, 1), "d2h_mb_per_s": round(d2h, 1),
                 "host_cores": os.cpu_count()}
    print(f"[bench] host<->device link: H2D {h2d:.0f} MB/s, D2H {d2h:.0f} "
          f"MB/s, {os.cpu_count()} host cores", file=sys.stderr)

    # --- headline: end-to-end codec, stereo CD (BASELINE config #2) --------
    left, right = make_corpus(min(seconds, 300.0))
    w_cd = WavData(44100, 16, [left, right])
    e2e = bench_e2e(w_cd, iters=e2e_iters, label="e2e CD 16/44.1")

    detail: dict = {
        "e2e_encode_gbps": e2e["encode_gbps"],
        "e2e_decode_gbps": e2e["decode_gbps"],
        "e2e_aggregate_gbps": e2e["aggregate_gbps"],
        "compression_ratio": e2e["compression_ratio"],
        "e2e_pcm_mb": e2e["pcm_mb"],
        "io_tunnel": io_tunnel,
        "e2e_note": (
            "e2e includes every host<->device transfer; in this sandbox the "
            "device link is a network tunnel (see io_tunnel) so e2e measures "
            "the tunnel, not the codec — see bench.py docstring"
        ),
        "device": f"{dev.platform}:{dev.device_kind}",
    }

    # --- beyond-reference: adaptive partitioned residues (v2 profile) ------
    # measured on-chip so the ratio win and its throughput cost are recorded
    # per round (FORMAT.md §Partitioned residues; default profile stays v1)
    if not os.environ.get("SELA_BENCH_SKIP_PARTITION"):
        from .codec.decoder import decode_sela
        from .codec.encoder import encode_wav
        from .config import BitstreamProfile

        v2 = BitstreamProfile(residue_partition=4)
        pcm_cd = w_cd.n_samples * w_cd.n_channels * w_cd.bits_per_sample // 8
        buf2 = encode_wav(w_cd, profile=v2)  # warmup/compile
        t2, buf2 = _timed_min(
            lambda: encode_wav(w_cd, profile=v2), max(e2e_iters - 1, 1))
        _assert_equal_wav(w_cd, decode_sela(buf2), "partitioned v2")
        r2 = len(buf2) / pcm_cd
        detail["partitioned_v2"] = {
            "encode_gbps": round(pcm_cd / t2 / 1e9, 4),
            "compression_ratio": round(r2, 4),
            "ratio_delta_vs_v1": round(r2 - e2e["compression_ratio"], 4),
            "bit_exact": True,
        }
        print(f"[bench] partitioned v2: encode {pcm_cd/t2/1e9:.3f} GB/s, "
              f"ratio {r2:.4f} ({r2 - e2e['compression_ratio']:+.4f} vs v1)",
              file=sys.stderr)

    # --- BASELINE config #4: 24-bit/96k hi-res (limb-kernel domain) --------
    if not os.environ.get("SELA_BENCH_SKIP_HIRES"):
        l24, r24 = make_corpus(min(seconds / 4, 60.0), rate=96000, seed=1,
                               bits=24)
        detail["config4_hires_24bit_96k"] = bench_e2e(
            WavData(96000, 24, [l24, r24]), iters=max(e2e_iters - 1, 1),
            label="e2e hi-res 24/96",
        )

    # --- 32-bit PCM (pallas_generic kernel domain) --------------------------
    if not os.environ.get("SELA_BENCH_SKIP_32BIT"):
        l32, r32 = make_corpus(min(seconds / 8, 30.0), seed=2, bits=32)
        detail["config_32bit"] = bench_e2e(
            WavData(44100, 32, [l32, r32]), iters=max(e2e_iters - 1, 1),
            label="e2e 32-bit",
        )

    # --- BASELINE config #3: 64 heterogeneous files -------------------------
    if not os.environ.get("SELA_BENCH_SKIP_BATCH"):
        detail["config3_batch64"] = bench_batch64()

    # --- host Rice pack/unpack (tunnel-independent, gated) ------------------
    if not os.environ.get("SELA_BENCH_SKIP_HOSTPACK"):
        detail["host_pack"] = bench_host_pack()

    # --- device pack A/B (informational; VERDICT r4 item 3) -----------------
    if not os.environ.get("SELA_BENCH_SKIP_DEVICE"):
        detail["device_pack"] = bench_device_pack()

    # --- device pipeline (headline: tracks kernel quality across rounds) ----
    baseline = 0.625  # GB/s/chip: 10 GB/s north-star / 16 v5p chips
    if not os.environ.get("SELA_BENCH_SKIP_DEVICE"):
        dp = bench_device_pipeline(min(seconds, 60.0), chunk_frames, iters,
                                   n_chunks)
        detail["device_pipeline"] = dp
        # tunnel-independent probes for the other kernel domains
        # (VERDICT r4 item 4: a generic-i64 regression was invisible before)
        detail["device_pipeline_24bit"] = bench_device_pipeline(
            15.0, 2048, max(iters - 2, 2), 4, bits=24,
            label="device pipeline 24-bit", measure_compile=False)
        detail["device_pipeline_32bit"] = bench_device_pipeline(
            15.0, 2048, max(iters - 2, 2), 4, bits=32,
            label="device pipeline 32-bit", measure_compile=False)
        agg = dp["aggregate_gbps"]
        metric = "encode+decode GB/s/chip (CD corpus, device pipeline)"
    else:
        agg = e2e["aggregate_gbps"]
        metric = "e2e encode+decode GB/s/chip (WAV->sela->WAV, host incl.)"
    result = {
        "metric": metric,
        "value": agg,
        "unit": "GB/s",
        "vs_baseline": round(agg / baseline, 4),
        "detail": detail,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    run_bench()
