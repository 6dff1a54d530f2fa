"""Host-side encode orchestration: WAV -> framed device batches -> container.

TPU-native analog of upstream:src/encoder.cpp (sela::Encoder::process,
sahaRatul/sela, path-level cite — mount empty, SURVEY.md SS2): where the
reference fans individual frames out to std::thread workers and joins them in
order, we pad frames into dense [F, C, S] chunks, run the jit'd encode_step
per chunk (one XLA program; frame axis is the data-parallel axis), then pack
bits and serialize the container on the host in original frame order.
"""
from __future__ import annotations

import numpy as np

from ..format import FRAME_SIZE, MAX_ORDER
from ..ref import container
from ..ref import rice as ref_rice
from ..ref.frame import SubFrame
from ..ref.wav import WavData
from ..utils.bitpack import pack_blocks
from .pipeline import default_fused, encode_step

DEFAULT_CHUNK_FRAMES = 512


def frame_batches(channels: list[np.ndarray], frame_size: int = FRAME_SIZE):
    """channels -> (x [F, C, S] int32 zero-padded, n_valid [F] int32)."""
    n = len(channels[0])
    C = len(channels)
    F = -(-n // frame_size)
    x = np.zeros((F, C, frame_size), dtype=np.int32)
    for c, ch in enumerate(channels):
        full = F * frame_size
        buf = np.zeros(full, dtype=np.int32)
        buf[:n] = ch
        x[:, c, :] = buf.reshape(F, frame_size)
    n_valid = np.full(F, frame_size, dtype=np.int32)
    if n % frame_size:
        n_valid[-1] = n % frame_size
    return x, n_valid


def encode_wav(w: WavData, frame_size: int = FRAME_SIZE,
               chunk_frames: int = DEFAULT_CHUNK_FRAMES,
               profile=None, metrics=None) -> bytes:
    """Encode WavData to .sela bytes using the JAX pipeline.

    profile: optional sela_tpu.config.BitstreamProfile (defaults = v1).
    metrics: optional sela_tpu.utils.metrics.Metrics sink for stage timings.
    """
    if w.n_samples == 0:
        raise ValueError("empty audio")
    max_order, rice_k_max, allow_ms = MAX_ORDER, None, True
    if profile is not None:
        profile.validate()
        frame_size = profile.frame_size
        max_order = profile.max_order
        rice_k_max = profile.rice_k_max
        allow_ms = profile.mid_side != "off"
    allow_ms = allow_ms and w.bits_per_sample <= 24  # FORMAT.md: 32-bit is LR-only
    x, n_valid = frame_batches(w.channels, frame_size)
    F, C, S = x.shape

    from ..utils.metrics import NULL_METRICS

    m = metrics or NULL_METRICS
    frames: list[bytes] = []
    for start in range(0, F, chunk_frames):
        stop = min(start + chunk_frames, F)
        fcount = stop - start
        # pad chunk to the fixed size so jit compiles once
        xc = np.zeros((chunk_frames, C, S), dtype=np.int32)
        nv = np.zeros(chunk_frames, dtype=np.int32)
        xc[:fcount] = x[start:stop]
        nv[:fcount] = n_valid[start:stop]
        with m.stage("device_encode"):
            out = {
                k: np.asarray(v)
                for k, v in encode_step(
                    xc, nv, allow_ms=allow_ms, max_order=max_order,
                    rice_k_max=rice_k_max, fused=default_fused(allow_ms),
                ).items()
            }
        with m.stage("host_pack"):
            frames.extend(_pack_chunk(out, nv, fcount))
        m.count("frames", fcount)
    header = container.SelaHeader(w.sample_rate, w.bits_per_sample, C, F)
    buf = container.serialize_file(header, frames)
    m.count("pcm_bytes", w.n_samples * w.n_channels * w.bits_per_sample // 8)
    m.count("coded_bytes", len(buf))
    return buf


def _pack_chunk(out: dict, n_valid: np.ndarray, fcount: int) -> list[bytes]:
    """Rice-pack and serialize the frames of one device chunk (host side)."""
    _, C, S = out["residues"].shape
    res_blocks = []
    coeff_blocks = []
    for f in range(fcount):
        for c in range(C):
            o = int(out["order"][f, c])
            res_blocks.append(
                (out["residues"][f, c, : n_valid[f]], int(out["k_res"][f, c]))
            )
            coeff_blocks.append(
                (out["qcoeffs"][f, c, :o], int(out["k_coeff"][f, c]))
            )
    res_words = pack_blocks(res_blocks)
    coeff_words = pack_blocks(coeff_blocks)

    frames = []
    i = 0
    for f in range(fcount):
        subframes = []
        for c in range(C):
            sf = SubFrame(
                channel=c,
                sftype=int(out["sftype"][f, c]),
                order=int(out["order"][f, c]),
                k_coeff=int(out["k_coeff"][f, c]),
                coeff_words=coeff_words[i],
                k_res=int(out["k_res"][f, c]),
                res_words=res_words[i],
                n_samples=int(n_valid[f]),
            )
            subframes.append(sf)
            i += 1
        frames.append(container.serialize_frame(subframes, int(n_valid[f])))
    return frames
