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
               profile=None, metrics=None, tags: dict | None = None) -> bytes:
    """Encode WavData to .sela bytes using the JAX pipeline.

    profile: optional sela_tpu.config.BitstreamProfile (defaults = v1).
    metrics: optional sela_tpu.utils.metrics.Metrics sink for stage timings.
    tags: optional metadata appended as a tags trailer (FORMAT.md §Tags).
    """
    if w.n_samples == 0:
        raise ValueError("empty audio")
    max_order, rice_k_max, allow_ms, partition = MAX_ORDER, None, True, 1
    ms_mode = "est"
    if profile is not None:
        profile.validate()
        frame_size = profile.frame_size
        max_order = profile.max_order
        rice_k_max = profile.rice_k_max
        allow_ms = profile.mid_side != "off"
        ms_mode = "exact" if profile.mid_side == "exact" else "est"
        partition = profile.residue_partition
    allow_ms = allow_ms and w.bits_per_sample <= 24  # FORMAT.md: 32-bit is LR-only
    x, n_valid = frame_batches(w.channels, frame_size)
    F, C, S = x.shape

    from ..utils.metrics import NULL_METRICS

    m = metrics or NULL_METRICS
    fused = default_fused(allow_ms)

    # int16 wire format halves the host->device PCM transfer for <=16-bit
    # audio (encode_step upcasts on device)
    wire_dtype = np.int16 if w.bits_per_sample <= 16 else np.int32

    def dispatch(start: int):
        """Async-dispatch one chunk's device work (jax returns futures)."""
        stop = min(start + chunk_frames, F)
        fcount = stop - start
        # pad chunk to the fixed size so jit compiles once
        xc = np.zeros((chunk_frames, C, S), dtype=wire_dtype)
        nv = np.zeros(chunk_frames, dtype=np.int32)
        xc[:fcount] = x[start:stop]
        nv[:fcount] = n_valid[start:stop]
        out = encode_step(
            xc, nv, allow_ms=allow_ms, max_order=max_order,
            rice_k_max=rice_k_max, fused=fused, partition=partition,
            ms_mode=ms_mode,
        )
        return out, nv, fcount

    # Software pipeline (SURVEY.md §2 "PP analog"): keep up to PIPELINE
    # chunks in flight on the device while the host Rice-packs completed
    # ones — jax dispatch is async, so device compute overlaps host packing.
    # Stage semantics (utils.metrics): "device_dispatch" is host-side async
    # dispatch cost only; the device compute wait lands in "device_fetch"
    # together with the D2H transfer (they are not separable without an
    # extra sync, which would break the pipeline overlap).
    PIPELINE = 4
    starts = list(range(0, F, chunk_frames))
    frames: list[bytes] = []
    inflight: list = []

    def fetch(out: dict) -> dict:
        """D2H of one chunk's planning arrays.

        Residues cross as int16 whenever every frame's values fit (the
        device-computed fits16 flags), halving the dominant transfer;
        the exact int32 array is fetched otherwise."""
        host = {
            k: np.asarray(out[k])
            for k in ("order", "qcoeffs", "k_res", "k_res4", "k_coeff",
                      "nw_res", "nw_coeff", "sftype")
        }
        if np.asarray(out["fits16"]).all():
            host["residues"] = np.asarray(out["res16"]).astype(np.int32)
        else:
            host["residues"] = np.asarray(out["residues"])
        return host

    for s in starts:
        with m.stage("device_dispatch"):
            inflight.append(dispatch(s))
        if len(inflight) >= PIPELINE:
            out, nv, fcount = inflight.pop(0)
            with m.stage("device_fetch"):
                out = fetch(out)
            with m.stage("host_pack"):
                frames.extend(_pack_chunk(out, nv, fcount))
            m.count("frames", fcount)
    for out, nv, fcount in inflight:
        with m.stage("device_fetch"):
            out = fetch(out)
        with m.stage("host_pack"):
            frames.extend(_pack_chunk(out, nv, fcount))
        m.count("frames", fcount)
    header = container.SelaHeader(w.sample_rate, w.bits_per_sample, C, F)
    buf = container.serialize_file(header, frames)
    if tags:
        buf += container.serialize_tags(tags)
    m.count("pcm_bytes", w.n_samples * w.n_channels * w.bits_per_sample // 8)
    m.count("coded_bytes", len(buf))
    return buf


def _native():
    import os

    if os.environ.get("SELA_NO_NATIVE"):
        return None
    try:
        from ..native import bitio

        return bitio if bitio.available() else None
    except Exception:  # pragma: no cover
        return None


def _exclusive_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a), np.int64)
    np.cumsum(a[:-1].astype(np.int64), out=out[1:])
    return out


def _pack_chunk_native(nat, out: dict, n_valid: np.ndarray,
                       fcount: int) -> list[bytes]:
    """Vectorized pack + native emit: no per-frame Python objects at all."""
    from ..format import SYNC

    _, C, S = out["residues"].shape
    nv = np.ascontiguousarray(n_valid[:fcount], np.int32)
    order = np.ascontiguousarray(out["order"][:fcount].reshape(-1), np.int32)
    k_coeff = np.ascontiguousarray(out["k_coeff"][:fcount].reshape(-1), np.int32)
    k_res = np.ascontiguousarray(out["k_res"][:fcount].reshape(-1), np.int32)
    k_res4 = np.ascontiguousarray(out["k_res4"][:fcount].reshape(-1), np.int32)
    sftype = np.ascontiguousarray(out["sftype"][:fcount].reshape(-1), np.int32)

    res_counts = np.repeat(nv, C)
    erows = out["residues"][:fcount].reshape(fcount * C, S)
    evals = erows[np.arange(S)[None, :] < res_counts[:, None]]
    res_words, res_wc = nat.pack_blocks_flat(
        evals, _exclusive_cumsum(res_counts), res_counts, k_res, k_res4)

    qrows = out["qcoeffs"][:fcount].reshape(fcount * C, -1)
    qvals = qrows[np.arange(qrows.shape[1])[None, :] < order[:, None]]
    coeff_words, coeff_wc = nat.pack_blocks_flat(
        qvals, _exclusive_cumsum(order), order, k_coeff)

    blob = nat.emit_frames(
        fcount, C, SYNC, nv,
        np.tile(np.arange(C, dtype=np.int32), fcount), sftype, order,
        k_coeff, coeff_wc.astype(np.int32), k_res, res_wc.astype(np.int32),
        coeff_words, res_words, sf_kr4=k_res4,
    )
    return [blob]


def _pack_chunk(out: dict, n_valid: np.ndarray, fcount: int) -> list[bytes]:
    """Rice-pack and serialize the frames of one device chunk (host side)."""
    nat = _native()
    if nat is not None:
        return _pack_chunk_native(nat, out, n_valid, fcount)
    from ..format import RICE_PARTITION_MARKER

    _, C, S = out["residues"].shape

    def sub_ks(f, c):
        kk = int(out["k_res4"][f, c])
        return [(kk >> (8 * q)) & 0xFF for q in range(4)]

    res_blocks = []
    coeff_blocks = []
    for f in range(fcount):
        for c in range(C):
            o = int(out["order"][f, c])
            kr = int(out["k_res"][f, c])
            res_blocks.append((
                out["residues"][f, c, : n_valid[f]],
                sub_ks(f, c) if kr == RICE_PARTITION_MARKER else kr,
            ))
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
            kr = int(out["k_res"][f, c])
            sf = SubFrame(
                channel=c,
                sftype=int(out["sftype"][f, c]),
                order=int(out["order"][f, c]),
                k_coeff=int(out["k_coeff"][f, c]),
                coeff_words=coeff_words[i],
                k_res=kr,
                res_words=res_words[i],
                n_samples=int(n_valid[f]),
                k_res_sub=(
                    sub_ks(f, c) if kr == RICE_PARTITION_MARKER else None
                ),
            )
            subframes.append(sf)
            i += 1
        frames.append(container.serialize_frame(subframes, int(n_valid[f])))
    return frames
