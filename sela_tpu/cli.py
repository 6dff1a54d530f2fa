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


def cmd_encode(args) -> int:
    from .ref.wav import read_wav

    w = read_wav(args.input)
    t0 = time.perf_counter()
    if args.engine == "ref":
        from .ref.codec import encode_wav

        buf = encode_wav(w)
    else:
        from .codec.encoder import encode_wav

        buf = encode_wav(w)
    dt = time.perf_counter() - t0
    with open(args.output, "wb") as f:
        f.write(buf)
    raw = w.n_samples * w.n_channels * w.bits_per_sample // 8
    print(
        f"encoded {args.input}: {_human(raw)} -> {_human(len(buf))} "
        f"(ratio {len(buf)/raw:.3f}) in {dt:.2f}s "
        f"[{_human(raw/dt)}/s, engine={args.engine}]"
    )
    return 0


def cmd_decode(args) -> int:
    from .ref.wav import write_wav

    with open(args.input, "rb") as f:
        buf = f.read()
    t0 = time.perf_counter()
    if args.engine == "ref":
        from .ref.codec import decode_sela

        w = decode_sela(buf)
    else:
        from .codec.decoder import decode_sela

        w = decode_sela(buf)
    dt = time.perf_counter() - t0
    write_wav(args.output, w)
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
    if args.engine == "ref":
        from .ref.codec import decode_sela, encode_wav
    else:
        from .codec.decoder import decode_sela
        from .codec.encoder import encode_wav

    buf = encode_wav(w)
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
    dur = n_samples / h.sample_rate
    import numpy as np

    print(
        f"{args.input}: {h.sample_rate} Hz, {h.bits_per_sample}-bit, "
        f"{h.channels} ch, {h.num_frames} frames, {dur:.2f}s\n"
        f"  mean LPC order {np.mean(orders):.1f}, mid/side frames "
        f"{ms_frames}/{h.num_frames}, {_human(len(buf))}"
    )
    return 0


def cmd_play(args) -> int:
    """Decode and stream to the default audio device.

    Parity: upstream:src/player.cpp (PortAudio). No audio stack exists in
    this environment; falls back to decoding + reporting, and supports
    --wav-out to listen elsewhere.
    """
    with open(args.input, "rb") as f:
        buf = f.read()
    from .codec.decoder import decode_sela

    w = decode_sela(buf)
    dur = w.n_samples / w.sample_rate
    try:
        import sounddevice as sd  # optional; absent in this image
        import numpy as np

        pcm = np.stack(w.channels, axis=1).astype(np.float32)
        pcm /= float(1 << (w.bits_per_sample - 1))
        sd.play(pcm, w.sample_rate, blocking=True)
        print(f"played {args.input}: {dur:.2f}s")
    except Exception:
        if args.wav_out:
            from .ref.wav import write_wav

            write_wav(args.wav_out, w)
            print(
                f"no audio device available; decoded {dur:.2f}s of audio to "
                f"{args.wav_out}"
            )
        else:
            print(
                f"no audio device available; decoded {dur:.2f}s "
                f"({w.sample_rate} Hz, {w.n_channels} ch) — use --wav-out to save"
            )
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
        return sp

    enc = add("encode", cmd_encode, help="WAV -> .sela")
    enc.add_argument("input")
    enc.add_argument("output")
    dec = add("decode", cmd_decode, help=".sela -> WAV")
    dec.add_argument("input")
    dec.add_argument("output")
    ver = add("verify", cmd_verify, help="round-trip bit-exactness check")
    ver.add_argument("input")
    inf = add("info", cmd_info, help="container info")
    inf.add_argument("input")
    ply = add("play", cmd_play, help="decode to audio device")
    ply.add_argument("input")
    ply.add_argument("--wav-out", default=None)
    ben = add("bench", cmd_bench, help="throughput benchmark")
    ben.add_argument("--seconds", type=float, default=60.0)
    return p


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # sela-compatible short flags: -e/-d/-p
    alias = {"-e": "encode", "-d": "decode", "-p": "play"}
    if argv and argv[0] in alias:
        argv[0] = alias[argv[0]]
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        from .utils.platform import force_cpu

        force_cpu()
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
