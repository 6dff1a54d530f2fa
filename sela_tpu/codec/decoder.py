"""Host-side decode orchestration: container -> device batches -> WAV.

TPU-native analog of upstream:src/decoder.cpp (sela::Decoder::process,
sahaRatul/sela, path-level cite — mount empty, SURVEY.md SS2): the container
is parsed and Rice-unpacked on the host (native C++ single-pass scanner +
threaded bit unpacker when built, Python/numpy fallback otherwise),
residues/coefficients are batched into dense [F, C, S] arrays, and the jit'd
decode_step runs the integer Levinson + IIR synthesis + inverse mid/side for
all frames at once on device. Device decode of chunk N overlaps host unpack
of chunk N+1 (software pipeline).
"""
from __future__ import annotations

import os

import numpy as np

from ..format import FRAME_SIZE, MAX_ORDER, SYNC
from ..ref import container
from ..ref import frame as frame_mod
from ..ref.wav import WavData
from ..utils.bitpack import unpack_blocks
from .pipeline import decode_step
from ..utils.platform import backend_is_tpu as _backend_is_tpu

DEFAULT_CHUNK_FRAMES = 512
PIPELINE = 4  # device-decode chunks in flight while the host unpacks ahead


def _native():
    if os.environ.get("SELA_NO_NATIVE"):
        return None
    try:
        from ..native import bitio

        return bitio if bitio.available() else None
    except Exception:  # pragma: no cover
        return None


def _resolve_iir(iir: str | None, bits_per_sample: int) -> str:
    if iir is not None:
        return iir
    import jax

    if _backend_is_tpu():
        return "pallas" if bits_per_sample <= 24 else "pallas_generic"
    return "scan"  # pallas interpret mode is slower than scan on CPU


def _scan_python(buf: bytes, header):
    """Python frame parse -> the same flat-array form as the native scanner."""
    C = header.channels
    F = header.num_frames
    pos = container.HEADER_SIZE
    n_samples = np.zeros(F, np.int32)
    keys = ("channel", "sftype", "order", "k_coeff", "nw_coeff", "k_res",
            "k_res4", "nw_res")
    sf = {k: np.zeros(F * C, np.int32) for k in keys}
    coeff_parts = []
    res_parts = []
    s = 0
    for f in range(F):
        subframes, ns, pos = container.parse_frame(buf, pos, C)
        n_samples[f] = ns
        for x in subframes:
            sf["channel"][s] = x.channel
            sf["sftype"][s] = x.sftype
            sf["order"][s] = x.order
            sf["k_coeff"][s] = x.k_coeff
            sf["nw_coeff"][s] = len(x.coeff_words)
            sf["k_res"][s] = x.k_res
            if x.k_res_sub is not None:
                kk = 0
                for q, sk in enumerate(x.k_res_sub):
                    kk |= int(sk) << (8 * q)
                sf["k_res4"][s] = kk
            sf["nw_res"][s] = len(x.res_words)
            coeff_parts.append(x.coeff_words)
            res_parts.append(x.res_words)
            s += 1
    sf["n_samples"] = n_samples
    sf["coeff_words"] = (
        np.concatenate(coeff_parts) if coeff_parts else np.zeros(0, np.uint32)
    )
    sf["res_words"] = (
        np.concatenate(res_parts) if res_parts else np.zeros(0, np.uint32)
    )
    return sf, pos


def _validate_layout(sf: dict, F: int, C: int) -> None:
    """Vectorized form of ref.frame.validate_subframe_layout over all frames.

    Channel bytes must be a per-frame permutation of 0..C-1 (rejects both
    out-of-range and duplicate channels — a duplicate would otherwise
    last-write-win in the dense scatter below) and sftype pairing must be
    exactly the encoder's (MID at even c, SIDE at c+1)."""
    from ..format import SF_MID, SF_SIDE

    ch = sf["channel"].reshape(F, C)
    if np.any(np.sort(ch, axis=1) != np.arange(C, dtype=ch.dtype)[None, :]):
        raise container.ContainerError(
            "subframe channels are not a permutation of 0..channels-1"
        )
    st = np.zeros((F, C), np.int32)
    st[np.arange(F)[:, None], ch] = sf["sftype"].reshape(F, C)
    if np.any((st < 0) | (st > SF_SIDE)):
        raise container.ContainerError("bad subframe type")
    mid = st == SF_MID
    side = st == SF_SIDE
    exp_side = np.zeros_like(side)
    exp_side[:, 1::2] = mid[:, 0::2][:, : C // 2]
    if np.any(side != exp_side) or np.any(mid[:, 1::2]) or (
        C % 2 == 1 and np.any(mid[:, C - 1])
    ):
        raise container.ContainerError("inconsistent MID/SIDE subframe pairing")


def _scan(buf: bytes, header):
    nat = _native()
    if nat is not None:
        try:
            sf, end = nat.scan_frames(
                buf, container.HEADER_SIZE, header.num_frames, header.channels,
                SYNC, FRAME_SIZE,
            )
        except ValueError as e:
            raise container.ContainerError(str(e)) from None
    else:
        sf, end = _scan_python(buf, header)
    if np.any(sf["order"] > MAX_ORDER):
        raise container.ContainerError("LPC order out of range")
    # rice k beyond the escape code would drive the bit readers out of their
    # <=32-bit domain (native get(k) is UB past 32) — reject before unpack.
    # k_res may also be the partition marker (sub-ks validated at parse).
    from ..format import RICE_K_ESCAPE, RICE_PARTITION_MARKER

    if np.any(sf["k_coeff"] > RICE_K_ESCAPE) or np.any(
        (sf["k_res"] > RICE_K_ESCAPE) & (sf["k_res"] != RICE_PARTITION_MARKER)
    ):
        raise container.ContainerError("rice k out of range")
    _validate_layout(sf, header.num_frames, header.channels)
    container.parse_trailer(buf, end)  # metadata passthrough; junk raises
    return sf


def _exclusive_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a) + 1, np.int64)
    np.cumsum(a.astype(np.int64), out=out[1:])
    return out


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
    S = FRAME_SIZE
    kernel = _resolve_iir(iir, header.bits_per_sample)
    nat = _native()

    with m.stage("host_parse"):
        sf = _scan(buf, header)
    n_valid = sf["n_samples"]
    res_counts = np.repeat(n_valid, C)  # residue count per subframe
    cw_offs = _exclusive_cumsum(sf["nw_coeff"])
    rw_offs = _exclusive_cumsum(sf["nw_res"])

    def unpack_chunk(lo_sf: int, hi_sf: int):
        """Unpack subframes [lo_sf, hi_sf) -> (qvals concat, evals concat)."""
        nwc = sf["nw_coeff"][lo_sf:hi_sf]
        nwr = sf["nw_res"][lo_sf:hi_sf]
        order = sf["order"][lo_sf:hi_sf]
        rcount = res_counts[lo_sf:hi_sf]
        if nat is not None:
            qvals = nat.unpack_blocks_flat(
                sf["coeff_words"][cw_offs[lo_sf] : cw_offs[hi_sf]],
                _exclusive_cumsum(nwc)[:-1], nwc, order,
                sf["k_coeff"][lo_sf:hi_sf],
            )
            frame_mod.check_coeff_range(qvals)
            evals = nat.unpack_blocks_flat(
                sf["res_words"][rw_offs[lo_sf] : rw_offs[hi_sf]],
                _exclusive_cumsum(nwr)[:-1], nwr, rcount,
                sf["k_res"][lo_sf:hi_sf], sf["k_res4"][lo_sf:hi_sf],
            )
            return qvals, evals
        from ..format import RICE_PARTITION_MARKER

        blocks = []
        for s in range(lo_sf, hi_sf):
            blocks.append((
                sf["coeff_words"][cw_offs[s] : cw_offs[s + 1]],
                int(sf["order"][s]), int(sf["k_coeff"][s]),
            ))
            kr = int(sf["k_res"][s])
            if kr == RICE_PARTITION_MARKER:
                kk = int(sf["k_res4"][s])
                kr = [(kk >> (8 * q)) & 0xFF for q in range(4)]
            blocks.append((
                sf["res_words"][rw_offs[s] : rw_offs[s + 1]],
                int(res_counts[s]), kr,
            ))
        values = unpack_blocks(blocks)
        qvals = (
            np.concatenate(values[0::2]) if values else np.zeros(0, np.int32)
        )
        frame_mod.check_coeff_range(qvals)
        evals = (
            np.concatenate(values[1::2]) if values else np.zeros(0, np.int32)
        )
        return qvals, evals

    def dispatch(start: int):
        """Host-unpack one chunk and async-dispatch its device decode."""
        stop = min(start + chunk_frames, F)
        fcount = stop - start
        lo_sf, hi_sf = start * C, stop * C
        n_sf = hi_sf - lo_sf
        with m.stage("host_unpack"):
            qvals, evals = unpack_chunk(lo_sf, hi_sf)
            # vectorized scatter into dense padded rows (file order), then
            # permute rows to (frame, channel) order via the channel bytes
            order = sf["order"][lo_sf:hi_sf]
            qrows = np.zeros((n_sf, MAX_ORDER), np.int32)
            qrows[np.arange(MAX_ORDER)[None, :] < order[:, None]] = qvals
            erows = np.zeros((n_sf, S), np.int32)
            erows[np.arange(S)[None, :] < res_counts[lo_sf:hi_sf][:, None]] = evals
            rows = (
                np.repeat(np.arange(fcount, dtype=np.int64), C) * C
                + sf["channel"][lo_sf:hi_sf]
            )
            # int16 wire format for the host->device residue transfer:
            # halves the dominant H2D when every value fits (decode_step
            # upcasts on device; separate jit signature per dtype)
            res_dtype = (
                np.int16
                if (evals.size == 0
                    or (evals.min() >= -(1 << 15) and evals.max() < (1 << 15)))
                else np.int32
            )
            residues = np.zeros((chunk_frames * C, S), res_dtype)
            qcoeffs = np.zeros((chunk_frames * C, MAX_ORDER), np.int32)
            orders = np.zeros(chunk_frames * C, np.int32)
            sftype = np.zeros(chunk_frames * C, np.int32)
            residues[rows] = erows
            qcoeffs[rows] = qrows
            orders[rows] = order
            sftype[rows] = sf["sftype"][lo_sf:hi_sf]
            residues = residues.reshape(chunk_frames, C, S)
            qcoeffs = qcoeffs.reshape(chunk_frames, C, MAX_ORDER)
            orders = orders.reshape(chunk_frames, C)
            sftype = sftype.reshape(chunk_frames, C)
        # int16 wire format halves the device->host PCM transfer for
        # <=16-bit streams (host upcasts back to int32)
        out_dtype = "int16" if header.bits_per_sample <= 16 else "int32"
        return (
            decode_step(residues, qcoeffs, orders, sftype, iir=kernel,
                        out_dtype=out_dtype),
            start, fcount,
        )

    chans_out: list[list[np.ndarray]] = [[] for _ in range(C)]

    def collect(item):
        xf, start, fcount = item
        # "device_fetch" = device compute wait + D2H transfer (dispatch is
        # async inside "host_unpack"'s dispatch() call — see utils.metrics)
        with m.stage("device_fetch"):
            x = np.asarray(xf).astype(np.int32, copy=False)
        m.count("frames", fcount)
        for f in range(fcount):
            for c in range(C):
                chans_out[c].append(x[f, c, : n_valid[start + f]])

    # Software pipeline: host unpack of chunk N+1 overlaps device decode of
    # chunk N (jax dispatch is async; the np.asarray in collect() syncs).
    inflight = []
    for start in range(0, F, chunk_frames):
        inflight.append(dispatch(start))
        if len(inflight) >= PIPELINE:
            collect(inflight.pop(0))
    for item in inflight:
        collect(item)

    channels = [
        np.concatenate(parts) if parts else np.zeros(0, np.int32)
        for parts in chans_out
    ]
    w = WavData(header.sample_rate, header.bits_per_sample, channels)
    m.count("coded_bytes", len(buf))
    m.count("pcm_bytes", w.n_samples * w.n_channels * w.bits_per_sample // 8)
    return w
