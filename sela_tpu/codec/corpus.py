"""Corpus-level batch codec: many heterogeneous WAV files per device chunk.

BASELINE.json config #3 ("batch of 64 heterogeneous WAV files, frame-parallel
encode on 1 chip"): frames from ALL files of a compatible group (same channel
count, same <=24-bit class) are concatenated along the frame axis and run
through the same jit'd encode_step chunks, so small files share device
batches instead of paying per-file dispatch. The reference processes files
one at a time (upstream:src/main.cpp single-file CLI — SURVEY.md SS2);
batch-of-files is the TPU-native widening of its frame-level threading.
"""
from __future__ import annotations

import numpy as np

from ..format import FRAME_SIZE
from ..ref import container
from ..ref.frame import SubFrame, check_coeff_range, validate_subframe_layout
from ..ref.wav import WavData
from ..utils.bitpack import pack_blocks, unpack_blocks
from .decoder import DEFAULT_CHUNK_FRAMES
from .encoder import frame_batches
from .pipeline import decode_step, default_fused, encode_step
from ..utils.platform import backend_is_tpu as _backend_is_tpu


def encode_files(wavs: list[WavData], chunk_frames: int = DEFAULT_CHUNK_FRAMES,
                 frame_size: int = FRAME_SIZE) -> list[bytes]:
    """Encode a batch of WavData to .sela bytes, sharing device chunks."""
    # group by (channels, <=24bit) — those share a jit signature and MS rule
    groups: dict[tuple[int, bool], list[int]] = {}
    for i, w in enumerate(wavs):
        if w.n_samples == 0:
            raise ValueError(f"file {i}: empty audio")
        groups.setdefault((w.n_channels, w.bits_per_sample <= 24), []).append(i)

    results: list[bytes | None] = [None] * len(wavs)
    for (C, allow_ms), idxs in groups.items():
        # concatenate all frames of the group along the frame axis
        per_file = []
        for i in idxs:
            x, nv = frame_batches(wavs[i].channels, frame_size)
            per_file.append((i, x, nv))
        x_all = np.concatenate([x for _, x, _ in per_file])
        nv_all = np.concatenate([nv for _, _, nv in per_file])
        F_all = x_all.shape[0]

        outs = []
        plan_keys = ("order", "qcoeffs", "k_res", "k_coeff", "nw_res",
                     "nw_coeff", "sftype")
        for start in range(0, F_all, chunk_frames):
            stop = min(start + chunk_frames, F_all)
            xc = np.zeros((chunk_frames, C, frame_size), np.int32)
            nc = np.zeros(chunk_frames, np.int32)
            xc[: stop - start] = x_all[start:stop]
            nc[: stop - start] = nv_all[start:stop]
            out = encode_step(
                xc, nc, allow_ms=allow_ms, fused=default_fused(allow_ms)
            )
            host = {k: np.asarray(out[k])[: stop - start] for k in plan_keys}
            # int16 wire for the residue fetch when every frame fits
            if np.asarray(out["fits16"]).all():
                host["residues"] = (
                    np.asarray(out["res16"])[: stop - start].astype(np.int32)
                )
            else:
                host["residues"] = np.asarray(out["residues"])[: stop - start]
            outs.append(host)
        merged = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

        # pack all blocks of the whole group in one native call
        blocks = []
        for f in range(F_all):
            for c in range(C):
                o = int(merged["order"][f, c])
                blocks.append((merged["qcoeffs"][f, c, :o], int(merged["k_coeff"][f, c])))
                blocks.append(
                    (merged["residues"][f, c, : nv_all[f]], int(merged["k_res"][f, c]))
                )
        words = pack_blocks(blocks)

        # slice frames back out per file and serialize containers
        pos = 0
        bi = 0
        for i, x, nv in per_file:
            F = x.shape[0]
            frames = []
            for f in range(F):
                subframes = []
                for c in range(C):
                    cw = words[bi]
                    rw = words[bi + 1]
                    bi += 2
                    subframes.append(SubFrame(
                        channel=c,
                        sftype=int(merged["sftype"][pos + f, c]),
                        order=int(merged["order"][pos + f, c]),
                        k_coeff=int(merged["k_coeff"][pos + f, c]),
                        coeff_words=cw,
                        k_res=int(merged["k_res"][pos + f, c]),
                        res_words=rw,
                        n_samples=int(nv[f]),
                    ))
                frames.append(container.serialize_frame(subframes, int(nv[f])))
            header = container.SelaHeader(
                wavs[i].sample_rate, wavs[i].bits_per_sample, C, F
            )
            results[i] = container.serialize_file(header, frames)
            pos += F
    return results  # type: ignore[return-value]


def decode_files(bufs: list[bytes], chunk_frames: int = DEFAULT_CHUNK_FRAMES) -> list[WavData]:
    """Decode a batch of .sela buffers, sharing device chunks per group."""
    import jax

    parsed = []
    for buf in bufs:
        header = container.parse_header(buf)
        pos = container.HEADER_SIZE
        sfs = []
        nv = np.zeros(header.num_frames, np.int32)
        for f in range(header.num_frames):
            subframes, ns, pos = container.parse_frame(buf, pos, header.channels)
            # normative layout rules (FORMAT.md): reject out-of-range /
            # duplicate channel bytes and broken MID/SIDE pairing with
            # ContainerError BEFORE the dense scatter below (an unchecked
            # channel byte would IndexError; a duplicate would silently
            # last-write-win) — same rule as every other decode path
            validate_subframe_layout(
                [sf.channel for sf in subframes],
                [sf.sftype for sf in subframes], header.channels,
            )
            nv[f] = ns
            sfs.append(subframes)
        container.parse_trailer(buf, pos)  # metadata passthrough; junk raises
        parsed.append((header, sfs, nv))

    groups: dict[tuple[int, bool], list[int]] = {}
    for i, (h, _, _) in enumerate(parsed):
        groups.setdefault((h.channels, h.bits_per_sample <= 24), []).append(i)

    results: list[WavData | None] = [None] * len(bufs)
    on_tpu = _backend_is_tpu()
    S = FRAME_SIZE
    for (C, le24), idxs in groups.items():
        iir = ("pallas" if le24 else "pallas_generic") if on_tpu else "scan"
        F_all = sum(parsed[i][0].num_frames for i in idxs)
        residues = np.zeros((F_all, C, S), np.int32)  # narrowed at H2D below
        qcoeffs = np.zeros((F_all, C, 32), np.int32)
        orders = np.zeros((F_all, C), np.int32)
        sftype = np.zeros((F_all, C), np.int32)
        nv_all = np.zeros(F_all, np.int32)

        blocks = []
        meta = []
        pos = 0
        for i in idxs:
            h, sfs, nv = parsed[i]
            nv_all[pos : pos + h.num_frames] = nv
            for f, subframes in enumerate(sfs):
                for sf in subframes:
                    blocks.append((sf.coeff_words, sf.order, sf.k_coeff))
                    kr = sf.k_res_sub if sf.k_res_sub is not None else sf.k_res
                    blocks.append((sf.res_words, sf.n_samples, kr))
                    meta.append((pos + f, sf.channel, sf.order, sf.sftype, sf.n_samples))
            pos += h.num_frames
        values = unpack_blocks(blocks)
        for j, (fi, ch, order, t, ns) in enumerate(meta):
            check_coeff_range(values[2 * j])
            qcoeffs[fi, ch, :order] = values[2 * j]
            residues[fi, ch, :ns] = values[2 * j + 1]
            orders[fi, ch] = order
            sftype[fi, ch] = t

        pcm_parts = []
        # int16 wire for the residue upload when the whole group fits
        rdt = (
            np.int16
            if (residues.size == 0
                or (residues.min() >= -(1 << 15) and residues.max() < (1 << 15)))
            else np.int32
        )
        for start in range(0, F_all, chunk_frames):
            stop = min(start + chunk_frames, F_all)
            rc = np.zeros((chunk_frames, C, S), rdt)
            qc = np.zeros((chunk_frames, C, 32), np.int32)
            oc = np.zeros((chunk_frames, C), np.int32)
            tc = np.zeros((chunk_frames, C), np.int32)
            rc[: stop - start] = residues[start:stop]
            qc[: stop - start] = qcoeffs[start:stop]
            oc[: stop - start] = orders[start:stop]
            tc[: stop - start] = sftype[start:stop]
            pcm_parts.append(np.asarray(decode_step(rc, qc, oc, tc, iir=iir))[: stop - start])
        pcm = np.concatenate(pcm_parts)

        pos = 0
        for i in idxs:
            h, _, nv = parsed[i]
            F = h.num_frames
            chans = [
                np.concatenate([pcm[pos + f, c, : nv[f]] for f in range(F)])
                for c in range(C)
            ]
            results[i] = WavData(h.sample_rate, h.bits_per_sample, chans)
            pos += F
    return results  # type: ignore[return-value]
