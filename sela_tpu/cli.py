"""`selax` command-line interface.

Capability parity target: upstream:src/main.cpp (sahaRatul/sela CLI:
`sela -e in.wav out.sela`, `-d`, `-p`; path-level cite — mount empty,
SURVEY.md SS2). Subcommands here: encode / decode / play / verify / info /
bench, plus flag-compatible aliases -e/-d/-p.
"""
from __future__ import annotations

import argparse
import sys
import time


def _human(nbytes: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if nbytes < 1024:
            return f"{nbytes:.1f} {unit}"
        nbytes /= 1024
    return f"{nbytes:.1f} TB"


def _profile_from(args):
    """Build a BitstreamProfile from CLI flags (None = all defaults)."""
    from .config import BitstreamProfile

    p = BitstreamProfile(
        frame_size=getattr(args, "frame_size", None) or BitstreamProfile.frame_size,
        max_order=getattr(args, "max_order", None) or BitstreamProfile.max_order,
        rice_k_max=(
            BitstreamProfile.rice_k_max
            if getattr(args, "rice_k_max", None) is None
            else args.rice_k_max
        ),
        mid_side=(
            "off" if getattr(args, "no_mid_side", False)
            else ("exact" if getattr(args, "exact_mid_side", False) else "auto")
        ),
        residue_partition=(
            4 if getattr(args, "partition_residues", False) else 1
        ),
    )
    return p.validate()


def _metrics_from(args):
    from .utils.metrics import NULL_METRICS, Metrics

    return Metrics() if getattr(args, "log_json", False) else NULL_METRICS


def cmd_encode(args) -> int:
    from .ref.wav import read_wav
    from .utils.metrics import profiler_trace

    w = read_wav(args.input)
    profile = _profile_from(args)
    m = _metrics_from(args)
    t0 = time.perf_counter()
    with profiler_trace(args.profile_trace):
        tags = _parse_tag_args(args.tags or [])
        if args.engine == "ref":
            from .ref.codec import encode_wav

            buf = encode_wav(w, profile=profile, tags=tags)
        else:
            from .codec.encoder import encode_wav

            buf = encode_wav(
                w, profile=profile, chunk_frames=args.chunk_frames,
                metrics=m, tags=tags,
            )
    dt = time.perf_counter() - t0
    with open(args.output, "wb") as f:
        f.write(buf)
    if args.log_json:
        m.emit("encode")
    raw = w.n_samples * w.n_channels * w.bits_per_sample // 8
    print(
        f"encoded {args.input}: {_human(raw)} -> {_human(len(buf))} "
        f"(ratio {len(buf)/raw:.3f}) in {dt:.2f}s "
        f"[{_human(raw/dt)}/s, engine={args.engine}]"
    )
    return 0


def cmd_decode(args) -> int:
    from .ref.wav import write_wav
    from .utils.metrics import profiler_trace

    with open(args.input, "rb") as f:
        buf = f.read()
    m = _metrics_from(args)
    t0 = time.perf_counter()
    with profiler_trace(args.profile_trace):
        if args.engine == "ref":
            from .ref.codec import decode_sela

            w = decode_sela(buf)
        else:
            from .codec.decoder import decode_sela

            w = decode_sela(
                buf, chunk_frames=args.chunk_frames, iir=args.iir, metrics=m
            )
    dt = time.perf_counter() - t0
    write_wav(args.output, w)
    if args.log_json:
        m.emit("decode")
    raw = w.n_samples * w.n_channels * w.bits_per_sample // 8
    print(
        f"decoded {args.input}: {_human(len(buf))} -> {_human(raw)} "
        f"in {dt:.2f}s [{_human(raw/dt)}/s, engine={args.engine}]"
    )
    return 0


def cmd_verify(args) -> int:
    """Encode + decode round-trip, assert bit-exactness."""
    import numpy as np

    from .ref.wav import read_wav

    w = read_wav(args.input)
    profile = _profile_from(args)
    if args.engine == "ref":
        from .ref.codec import decode_sela, encode_wav
    else:
        from .codec.decoder import decode_sela
        from .codec.encoder import encode_wav

    buf = encode_wav(w, profile=profile)
    out = decode_sela(buf)
    ok = (
        out.sample_rate == w.sample_rate
        and out.bits_per_sample == w.bits_per_sample
        and len(out.channels) == len(w.channels)
        and all(np.array_equal(a, b) for a, b in zip(out.channels, w.channels))
    )
    raw = w.n_samples * w.n_channels * w.bits_per_sample // 8
    print(
        f"verify {args.input}: {'BIT-EXACT' if ok else 'MISMATCH'} "
        f"(ratio {len(buf)/raw:.3f}, engine={args.engine})"
    )
    return 0 if ok else 1


def cmd_info(args) -> int:
    from .ref import container

    with open(args.input, "rb") as f:
        buf = f.read()
    h = container.parse_header(buf)
    pos = container.HEADER_SIZE
    n_samples = 0
    orders = []
    ms_frames = 0
    for _ in range(h.num_frames):
        sfs, ns, pos = container.parse_frame(buf, pos, h.channels)
        n_samples += ns
        orders += [sf.order for sf in sfs]
        if any(sf.sftype == 1 for sf in sfs):
            ms_frames += 1
    tags = container.parse_trailer(buf, pos)
    dur = n_samples / h.sample_rate
    import numpy as np

    print(
        f"{args.input}: {h.sample_rate} Hz, {h.bits_per_sample}-bit, "
        f"{h.channels} ch, {h.num_frames} frames, {dur:.2f}s\n"
        f"  mean LPC order {np.mean(orders):.1f}, mid/side frames "
        f"{ms_frames}/{h.num_frames}, {_human(len(buf))}"
    )
    for k, v in tags.items():
        print(f"  tag {k} = {v if isinstance(v, str) else f'<{len(v)} bytes>'}")
    return 0


def _parse_tag_args(pairs: list[str]) -> dict:
    tags = {}
    for kv in pairs:
        if "=" not in kv:
            raise ValueError(f"tag must be KEY=VALUE, got {kv!r}")
        k, v = kv.split("=", 1)
        tags[k] = v
    return tags


def cmd_tag(args) -> int:
    """Read or edit the metadata trailer without re-encoding audio.

    Capability parity: C-lineage core/apev2.c (sahaRatul/sela, path-level
    cite — mount empty, SURVEY.md SS2 "APEv2 tags")."""
    from .ref import container

    with open(args.input, "rb") as f:
        buf = f.read()
    if args.set or args.clear:
        tags = {} if args.clear else dict(container.read_tags(buf))
        tags.update(_parse_tag_args(args.set or []))
        out = container.replace_tags(buf, tags, fmt=args.format)
        with open(args.output or args.input, "wb") as f:
            f.write(out)
        print(f"wrote {len(tags)} tag(s) to {args.output or args.input}")
        return 0
    tags = container.read_tags(buf)
    if not tags:
        print(f"{args.input}: no tags")
    for k, v in tags.items():
        print(f"{k} = {v if isinstance(v, str) else f'<{len(v)} bytes>'}")
    return 0


def cmd_play(args) -> int:
    """Decode incrementally and stream to the default audio device.

    Parity: upstream:src/player.cpp + C-lineage core/packetqueue.c. A
    producer thread decodes frame chunks into a bounded PacketQueue
    (sela_tpu.codec.stream.StreamingPlayer); the consumer feeds the sound
    device. No audio stack exists in this image — without one, the stream is
    consumed at full speed and optionally written via --wav-out.
    """
    import numpy as np

    from .codec.stream import StreamingPlayer

    with open(args.input, "rb") as f:
        buf = f.read()
    player = StreamingPlayer(buf, chunk_frames=args.chunk_frames)
    h = player.header
    scale = 1.0 / float(1 << (h.bits_per_sample - 1))
    try:
        import sounddevice as sd  # optional; absent in this image

        stream = sd.OutputStream(
            samplerate=h.sample_rate, channels=h.channels, dtype="float32"
        )
        n = 0
        with stream:
            for block in player:
                stream.write(np.ascontiguousarray(block, np.float32) * scale)
                n += len(block)
        print(f"played {args.input}: {n / h.sample_rate:.2f}s")
    except ImportError:
        blocks = list(player)  # stream-consume (bounded memory)
        n = sum(len(b) for b in blocks)
        dur = n / h.sample_rate
        if args.wav_out:
            from .ref.wav import WavData, write_wav

            pcm = np.concatenate(blocks, axis=0)
            write_wav(args.wav_out, WavData(
                h.sample_rate, h.bits_per_sample,
                [pcm[:, c].copy() for c in range(h.channels)],
            ))
            print(
                f"no audio device available; streamed {dur:.2f}s of audio to "
                f"{args.wav_out}"
            )
        else:
            print(
                f"no audio device available; stream-decoded {dur:.2f}s "
                f"({h.sample_rate} Hz, {h.channels} ch) — use --wav-out to save"
            )
    return 0


def cmd_encode_batch(args) -> int:
    import os

    from .codec.corpus import encode_files
    from .ref.wav import read_wav

    wavs = [read_wav(p) for p in args.inputs]
    t0 = time.perf_counter()
    bufs = encode_files(wavs)
    dt = time.perf_counter() - t0
    os.makedirs(args.out_dir, exist_ok=True)
    raw = 0
    comp = 0
    for p, w, buf in zip(args.inputs, wavs, bufs):
        name = os.path.splitext(os.path.basename(p))[0] + ".sela"
        with open(os.path.join(args.out_dir, name), "wb") as f:
            f.write(buf)
        raw += w.n_samples * w.n_channels * w.bits_per_sample // 8
        comp += len(buf)
    print(
        f"encoded {len(wavs)} files: {_human(raw)} -> {_human(comp)} "
        f"(ratio {comp/raw:.3f}) in {dt:.2f}s [{_human(raw/dt)}/s]"
    )
    return 0


def cmd_decode_batch(args) -> int:
    import os

    from .codec.corpus import decode_files
    from .ref.wav import write_wav

    bufs = [open(p, "rb").read() for p in args.inputs]
    t0 = time.perf_counter()
    wavs = decode_files(bufs)
    dt = time.perf_counter() - t0
    os.makedirs(args.out_dir, exist_ok=True)
    raw = 0
    for p, w in zip(args.inputs, wavs):
        name = os.path.splitext(os.path.basename(p))[0] + ".wav"
        write_wav(os.path.join(args.out_dir, name), w)
        raw += w.n_samples * w.n_channels * w.bits_per_sample // 8
    print(f"decoded {len(wavs)} files: {_human(raw)} in {dt:.2f}s [{_human(raw/dt)}/s]")
    return 0


def cmd_encode_shard(args) -> int:
    from .parallel.multihost import encode_shard, init_distributed
    from .ref.wav import read_wav

    rank, n_hosts = args.rank, args.n_hosts
    if rank is None:  # fall back to jax.distributed topology
        rank, n_hosts = init_distributed()
    w = read_wav(args.input)
    m = encode_shard(w, args.out_dir, rank, n_hosts,
                     chunk_frames=args.chunk_frames)
    print(
        f"shard {rank}/{n_hosts}: frames [{m['frame_lo']}, {m['frame_hi']}) "
        f"-> {_human(m['bytes'])} ({m['sha256'][:12]}…)"
    )
    return 0


def cmd_merge_shards(args) -> int:
    from .parallel.multihost import merge_shards, missing_shards

    missing = missing_shards(args.shard_dir, args.n_hosts)
    if missing:
        print(f"selax: missing shards {missing} — re-run encode-shard for them",
              file=sys.stderr)
        return 3
    info = merge_shards(args.shard_dir, args.n_hosts, args.output)
    print(f"merged {info['hosts']} shards, {info['frames']} frames -> {args.output}")
    return 0


def cmd_bench(args) -> int:
    from .bench import run_bench

    run_bench(seconds=args.seconds, engine=args.engine)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="selax", description="TPU-native SELA lossless audio codec"
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **kw):
        sp = sub.add_parser(name, **kw)
        sp.set_defaults(fn=fn)
        sp.add_argument(
            "--engine", choices=["jax", "ref"], default="jax",
            help="jax = TPU pipeline (default), ref = numpy oracle",
        )
        sp.add_argument(
            "--cpu", action="store_true",
            help="force the JAX CPU backend (unregisters TPU plugins)",
        )
        sp.add_argument(
            "--chunk-frames", type=int, default=512,
            help="frames per jit'd device batch (runtime-only knob)",
        )
        sp.add_argument(
            "--log-json", action="store_true",
            help="emit one JSON-lines metrics record to stderr",
        )
        sp.add_argument(
            "--profile-trace", default=None, metavar="DIR",
            help="write a jax.profiler trace (TensorBoard/Perfetto) to DIR",
        )
        return sp

    def add_profile_flags(sp):
        """Encoder-side BitstreamProfile knobs (defaults = FORMAT.md v1)."""
        sp.add_argument("--frame-size", type=int, default=None,
                        help="samples/channel/frame (<= 2048)")
        sp.add_argument("--max-order", type=int, default=None,
                        help="LPC order search cap (<= 32)")
        sp.add_argument("--rice-k-max", type=int, default=None,
                        help="Rice optimal-k search cap (<= 30)")
        sp.add_argument("--no-mid-side", action="store_true",
                        help="disable mid/side decorrelation candidates")
        sp.add_argument("--exact-mid-side", action="store_true",
                        help="decide mid/side from exact coded bits (renders "
                             "all candidates; ~2x slower encode for <=0.2% "
                             "smaller files vs the default modeled-cost rule)")
        sp.add_argument("--partition-residues", action="store_true",
                        help="adaptive 4-way partitioned residues (smaller "
                             "files on transient content; FORMAT.md)")

    enc = add("encode", cmd_encode, help="WAV -> .sela")
    enc.add_argument("input")
    enc.add_argument("output")
    enc.add_argument("--tag", action="append", metavar="KEY=VALUE",
                     dest="tags", help="attach a metadata tag (repeatable)")
    add_profile_flags(enc)
    dec = add("decode", cmd_decode, help=".sela -> WAV")
    dec.add_argument("input")
    dec.add_argument("output")
    dec.add_argument(
        "--iir", choices=["scan", "pallas", "pallas_generic"], default=None,
        help="decode kernel override (default: auto by backend/bit depth)",
    )
    ver = add("verify", cmd_verify, help="round-trip bit-exactness check")
    ver.add_argument("input")
    add_profile_flags(ver)
    inf = add("info", cmd_info, help="container info")
    inf.add_argument("input")
    tag = add("tag", cmd_tag, help="read/edit metadata tags (no re-encode)")
    tag.add_argument("input")
    tag.add_argument("--set", action="append", metavar="KEY=VALUE",
                     help="set a tag (repeatable)")
    tag.add_argument("--clear", action="store_true",
                     help="drop existing tags before applying --set")
    tag.add_argument("--format", choices=("setg", "apev2"), default="setg",
                     help="wire format for the written trailer: the compact "
                          "SeTg block or a real APEv2 header+items+footer "
                          "(reads auto-detect either)")
    tag.add_argument("--output", default=None,
                     help="write result here instead of in place")
    ply = add("play", cmd_play, help="decode to audio device")
    ply.add_argument("input")
    ply.add_argument("--wav-out", default=None)
    ben = add("bench", cmd_bench, help="throughput benchmark")
    ben.add_argument("--seconds", type=float, default=60.0)
    eb = add("encode-batch", cmd_encode_batch, help="batch WAVs -> .sela dir")
    eb.add_argument("inputs", nargs="+")
    eb.add_argument("out_dir")
    db = add("decode-batch", cmd_decode_batch, help="batch .sela -> WAV dir")
    db.add_argument("inputs", nargs="+")
    db.add_argument("out_dir")
    es = add("encode-shard", cmd_encode_shard,
             help="encode this host's frame range of a long WAV")
    es.add_argument("input")
    es.add_argument("out_dir")
    es.add_argument("--rank", type=int, default=None)
    es.add_argument("--n-hosts", type=int, default=1)
    ms = add("merge-shards", cmd_merge_shards,
             help="rank-ordered merge of shard parts into one .sela")
    ms.add_argument("shard_dir")
    ms.add_argument("output")
    ms.add_argument("--n-hosts", type=int, required=True)
    return p


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # sela-compatible short flags: -e/-d/-p
    alias = {"-e": "encode", "-d": "decode", "-p": "play"}
    if argv and argv[0] in alias:
        argv[0] = alias[argv[0]]
    args = build_parser().parse_args(argv)
    from .utils.platform import respect_platform_env

    respect_platform_env()
    if getattr(args, "cpu", False):
        from .utils.platform import force_cpu

        force_cpu()
    import os

    from .utils.platform import enable_compile_cache

    enable_compile_cache(os.environ.get(
        "SELA_CACHE_DIR",
        os.path.expanduser("~/.cache/selax/jax"),
    ))
    from .ref.container import ContainerError
    from .ref.wav import WavError

    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"selax: file not found: {e.filename}", file=sys.stderr)
    except (ContainerError, WavError, ValueError) as e:
        print(f"selax: {e}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
