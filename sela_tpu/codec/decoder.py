"""Host-side decode orchestration: container -> device batches -> WAV.

TPU-native analog of upstream:src/decoder.cpp (sela::Decoder::process,
sahaRatul/sela, path-level cite — mount empty, SURVEY.md SS2): the container
is parsed and Rice-unpacked on the host (native C++ fast path when built),
residues/coefficients are batched into dense [F, C, S] arrays, and the jit'd
decode_step runs the integer Levinson + IIR synthesis + inverse mid/side for
all frames at once on device.
"""
from __future__ import annotations

import numpy as np

from ..format import FRAME_SIZE, MAX_ORDER
from ..ref import container
from ..ref.wav import WavData
from ..utils.bitpack import unpack_blocks
from .pipeline import decode_step

DEFAULT_CHUNK_FRAMES = 512


def decode_sela(buf: bytes, chunk_frames: int = DEFAULT_CHUNK_FRAMES,
                iir: str | None = None, metrics=None) -> WavData:
    """Decode .sela bytes with the JAX pipeline.

    iir: decode kernel override (scan | pallas | pallas_generic); default
    picks per backend/bit depth. metrics: optional Metrics sink.
    """
    from ..utils.metrics import NULL_METRICS

    m = metrics or NULL_METRICS
    header = container.parse_header(buf)
    C = header.channels
    F = header.num_frames

    # parse all frames (host)
    with m.stage("host_parse"):
        pos = container.HEADER_SIZE
        all_sf = []
        n_valid = np.zeros(F, dtype=np.int32)
        for f in range(F):
            subframes, n_samples, pos = container.parse_frame(buf, pos, C)
            n_valid[f] = n_samples
            all_sf.append(subframes)
        if pos != len(buf):
            raise container.ContainerError("trailing bytes after last frame")

    S = FRAME_SIZE
    chans_out: list[list[np.ndarray]] = [[] for _ in range(C)]
    for start in range(0, F, chunk_frames):
        stop = min(start + chunk_frames, F)
        fcount = stop - start
        residues = np.zeros((chunk_frames, C, S), dtype=np.int32)
        qcoeffs = np.zeros((chunk_frames, C, MAX_ORDER), dtype=np.int32)
        orders = np.zeros((chunk_frames, C), dtype=np.int32)
        sftype = np.zeros((chunk_frames, C), dtype=np.int32)

        with m.stage("host_unpack"):
            blocks = []
            meta = []
            for f in range(start, stop):
                for sf in all_sf[f]:
                    blocks.append((sf.coeff_words, sf.order, sf.k_coeff))
                    blocks.append((sf.res_words, sf.n_samples, sf.k_res))
                    meta.append(
                        (f - start, sf.channel, sf.order, sf.sftype, sf.n_samples)
                    )
            values = unpack_blocks(blocks)
            for i, (fi, ch, order, t, ns) in enumerate(meta):
                q = values[2 * i]
                e = values[2 * i + 1]
                if order > MAX_ORDER or ns > S:
                    raise container.ContainerError("order/frame size out of range")
                qcoeffs[fi, ch, :order] = q
                residues[fi, ch, :ns] = e
                orders[fi, ch] = order
                sftype[fi, ch] = t

        kernel = iir
        if kernel is None:
            import jax

            if jax.default_backend() == "tpu":
                kernel = "pallas" if header.bits_per_sample <= 24 else "pallas_generic"
            else:
                kernel = "scan"  # pallas interpret mode is slower than scan on CPU
        with m.stage("device_decode"):
            x = np.asarray(decode_step(residues, qcoeffs, orders, sftype, iir=kernel))
        m.count("frames", fcount)
        for f in range(fcount):
            for c in range(C):
                chans_out[c].append(x[f, c, : n_valid[start + f]])

    channels = [
        np.concatenate(parts) if parts else np.zeros(0, np.int32)
        for parts in chans_out
    ]
    w = WavData(header.sample_rate, header.bits_per_sample, channels)
    m.count("coded_bytes", len(buf))
    m.count("pcm_bytes", w.n_samples * w.n_channels * w.bits_per_sample // 8)
    return w
