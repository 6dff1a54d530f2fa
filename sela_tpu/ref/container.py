"""`.sela` container serialization — numpy oracle (normative, FORMAT.md).

Capability parity target: upstream:src/file/sela_file.cpp (sahaRatul/sela,
path-level cite — mount empty, SURVEY.md SS2).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..format import MAGIC, MAX_FRAME_SAMPLES, SYNC
from .frame import SubFrame


class ContainerError(ValueError):
    pass


@dataclass
class SelaHeader:
    sample_rate: int
    bits_per_sample: int
    channels: int
    num_frames: int


def serialize_subframe(sf: SubFrame) -> bytes:
    parts = [
        struct.pack(
            "<BBBBH", sf.channel, sf.sftype, sf.order, sf.k_coeff, len(sf.coeff_words)
        ),
        np.asarray(sf.coeff_words, dtype="<u4").tobytes(),
        struct.pack("<BI", sf.k_res, len(sf.res_words)),
        np.asarray(sf.res_words, dtype="<u4").tobytes(),
    ]
    return b"".join(parts)


def serialize_frame(subframes: list[SubFrame], n_samples: int) -> bytes:
    out = [struct.pack("<IH", SYNC, n_samples)]
    out += [serialize_subframe(sf) for sf in subframes]
    return b"".join(out)


def serialize_file(header: SelaHeader, frames: list[bytes]) -> bytes:
    head = MAGIC + struct.pack(
        "<IHBI", header.sample_rate, header.bits_per_sample, header.channels,
        header.num_frames,
    )
    return head + b"".join(frames)


HEADER_SIZE = 4 + 4 + 2 + 1 + 4


def parse_header(buf: bytes) -> SelaHeader:
    if len(buf) < HEADER_SIZE or buf[:4] != MAGIC:
        raise ContainerError("bad magic — not a sela file")
    rate, bps, nch, nframes = struct.unpack_from("<IHBI", buf, 4)
    if nch == 0:
        raise ContainerError("zero channels")
    return SelaHeader(rate, bps, nch, nframes)


def parse_subframe(buf: bytes, pos: int, n_samples: int) -> tuple[SubFrame, int]:
    if pos + 6 > len(buf):
        raise ContainerError("truncated subframe header")
    ch, sftype, order, k_c, nwc = struct.unpack_from("<BBBBH", buf, pos)
    pos += 6
    if pos + 4 * nwc > len(buf):
        raise ContainerError("truncated coefficient block")
    cw = np.frombuffer(buf, dtype="<u4", count=nwc, offset=pos).astype(np.uint32)
    pos += 4 * nwc
    if pos + 5 > len(buf):
        raise ContainerError("truncated residue block header")
    k_r, nwr = struct.unpack_from("<BI", buf, pos)
    pos += 5
    if pos + 4 * nwr > len(buf):
        raise ContainerError("truncated residue block")
    rw = np.frombuffer(buf, dtype="<u4", count=nwr, offset=pos).astype(np.uint32)
    pos += 4 * nwr
    return SubFrame(ch, sftype, order, k_c, cw, k_r, rw, n_samples), pos


def parse_frame(buf: bytes, pos: int, nch: int) -> tuple[list[SubFrame], int, int]:
    """Returns (subframes, n_samples, new_pos)."""
    if pos + 6 > len(buf):
        raise ContainerError("truncated frame header")
    sync, n_samples = struct.unpack_from("<IH", buf, pos)
    if sync != SYNC:
        raise ContainerError(f"bad frame sync at offset {pos}: {sync:#010x}")
    if not 0 < n_samples <= MAX_FRAME_SAMPLES:
        raise ContainerError(f"bad frame sample count: {n_samples}")
    pos += 6
    subframes = []
    for _ in range(nch):
        sf, pos = parse_subframe(buf, pos, n_samples)
        subframes.append(sf)
    return subframes, n_samples, pos
