"""ctypes bindings for the native Rice bitstream library (bitio.cpp).

Build with `make -C sela_tpu/native` (g++ only; no pybind11 — the image has
none). sela_tpu.utils.bitpack auto-falls back to the numpy oracle coder when
the .so is absent; outputs are bit-identical either way (tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libselabitio.so")
_SRC_PATH = os.path.join(_DIR, "bitio.cpp")
if os.path.exists(_SRC_PATH) and (
    not os.path.exists(_LIB_PATH)
    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)
):
    # best-effort build (the .so is not checked in; rebuilt when stale)
    import subprocess

    subprocess.run(
        ["make", "-C", _DIR, "-s"], capture_output=True, timeout=120, check=False
    )
_lib = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        _i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        _u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        _lib.rice_block_words.argtypes = [
            _i32p, _i64p, _i32p, _i32p, _i32p, ctypes.c_int64, _i64p,
        ]
        _lib.rice_pack_blocks.argtypes = [
            _i32p, _i64p, _i32p, _i32p, _i32p, _i64p, ctypes.c_int64, _u32p,
        ]
        _lib.rice_unpack_blocks.argtypes = [
            _u32p, _i64p, _i32p, _i64p, _i32p, _i32p, _i32p,
            ctypes.c_int64, _i32p,
        ]
        _u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        _lib.sela_scan_frames.argtypes = [
            _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_uint32, ctypes.c_int32,
            _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
            _u32p, ctypes.POINTER(ctypes.c_int64),
            _u32p, ctypes.POINTER(ctypes.c_int64),
        ]
        _lib.sela_scan_frames.restype = ctypes.c_int64
        _lib.sela_emit_frames.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32,
            _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
            _u32p, _u32p, _u8p,
        ]
        _lib.sela_emit_frames.restype = ctypes.c_int64
    except OSError:  # pragma: no cover
        _lib = None


def available() -> bool:
    return _lib is not None


def _ks4_arr(ks4, n: int) -> np.ndarray:
    """Packed sub-ks array (k0 | k1<<8 | ...), zeros when none partitioned."""
    if ks4 is None:
        return np.zeros(n, dtype=np.int32)
    return np.ascontiguousarray(ks4, dtype=np.int32)


def pack_blocks_flat(values: np.ndarray, offs: np.ndarray, counts: np.ndarray,
                     ks: np.ndarray, ks4: np.ndarray | None = None):
    """Flat-array fast path.

    values: concatenated int32; block i = values[offs[i] : offs[i]+counts[i]]
    with Rice parameter ks[i] (32 = partition marker, sub-ks byte-packed in
    ks4[i]). Returns (words concat uint32, word_counts).
    """
    n = len(counts)
    values = np.ascontiguousarray(values, dtype=np.int32)
    offs = np.ascontiguousarray(offs, dtype=np.int64)
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    ks = np.ascontiguousarray(ks, dtype=np.int32)
    k4 = _ks4_arr(ks4, n)
    word_counts = np.zeros(n, dtype=np.int64)
    _lib.rice_block_words(values, offs, counts, ks, k4, n, word_counts)
    word_offs = np.zeros(n, dtype=np.int64)
    np.cumsum(word_counts[:-1], out=word_offs[1:])
    out = np.zeros(int(word_counts.sum()), dtype=np.uint32)
    _lib.rice_pack_blocks(values, offs, counts, ks, k4, word_offs, n, out)
    return out, word_counts


def unpack_blocks_flat(words: np.ndarray, word_offs: np.ndarray,
                       word_counts: np.ndarray, counts: np.ndarray,
                       ks: np.ndarray, ks4: np.ndarray | None = None) -> np.ndarray:
    """Returns concatenated int32 values (block i has counts[i] values)."""
    n = len(counts)
    words = np.ascontiguousarray(words, dtype=np.uint32)
    word_offs = np.ascontiguousarray(word_offs, dtype=np.int64)
    word_counts = np.ascontiguousarray(word_counts, dtype=np.int32)
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    ks = np.ascontiguousarray(ks, dtype=np.int32)
    k4 = _ks4_arr(ks4, n)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1].astype(np.int64), out=offs[1:])
    out = np.zeros(int(counts.astype(np.int64).sum()), dtype=np.int32)
    _lib.rice_unpack_blocks(words, word_offs, word_counts, offs, counts, ks,
                            k4, n, out)
    return out


def _split_ks(klist) -> tuple[np.ndarray, np.ndarray]:
    """k entries that are sequences (partitioned sub-ks) -> (ks, ks4)."""
    from ..format import RICE_PARTITION_MARKER

    ks = np.zeros(len(klist), np.int32)
    ks4 = np.zeros(len(klist), np.int32)
    for i, k in enumerate(klist):
        if np.ndim(k) > 0 or isinstance(k, (list, tuple)):
            ks[i] = RICE_PARTITION_MARKER
            kk = 0
            for q, sk in enumerate(k):
                kk |= int(sk) << (8 * q)
            ks4[i] = kk
        else:
            ks[i] = int(k)
    return ks, ks4


def pack_blocks(blocks: list[tuple[np.ndarray, object]]) -> list[np.ndarray]:
    """List API used by utils.bitpack (mirrors the numpy oracle signature).

    A block's k may be an int (plain) or a sequence of sub-ks (partitioned,
    FORMAT.md §Partitioned residues)."""
    if not blocks:
        return []
    counts = np.array([len(v) for v, _ in blocks], dtype=np.int32)
    ks, ks4 = _split_ks([k for _, k in blocks])
    offs = np.zeros(len(blocks), dtype=np.int64)
    np.cumsum(counts[:-1].astype(np.int64), out=offs[1:])
    values = (
        np.concatenate([np.asarray(v, dtype=np.int32) for v, _ in blocks])
        if counts.sum() else np.zeros(0, np.int32)
    )
    words, word_counts = pack_blocks_flat(values, offs, counts, ks, ks4)
    out = []
    pos = 0
    for wc in word_counts:
        out.append(words[pos : pos + wc].copy())
        pos += wc
    return out


def unpack_blocks(blocks: list[tuple[np.ndarray, int, object]]) -> list[np.ndarray]:
    if not blocks:
        return []
    word_counts = np.array([len(w) for w, _, _ in blocks], dtype=np.int32)
    counts = np.array([c for _, c, _ in blocks], dtype=np.int32)
    ks, ks4 = _split_ks([k for _, _, k in blocks])
    word_offs = np.zeros(len(blocks), dtype=np.int64)
    np.cumsum(word_counts[:-1].astype(np.int64), out=word_offs[1:])
    words = (
        np.concatenate([np.asarray(w, dtype=np.uint32) for w, _, _ in blocks])
        if word_counts.sum() else np.zeros(0, np.uint32)
    )
    flat = unpack_blocks_flat(words, word_offs, word_counts, counts, ks, ks4)
    out = []
    pos = 0
    for c in counts:
        out.append(flat[pos : pos + c].copy())
        pos += c
    return out


def scan_frames(buf: bytes, pos: int, num_frames: int, channels: int,
                sync: int, max_samples: int):
    """Single-pass native container scan (FORMAT.md frame layout).

    Returns (fields dict, end_pos) or raises ValueError at the first
    structural error. fields: n_samples [F]; per-subframe arrays [F*C] in
    file order (channel, sftype, order, k_coeff, nw_coeff, k_res, nw_res);
    coeff_words / res_words — aligned uint32 arrays concatenated in subframe
    order, ready for unpack_blocks_flat.
    """
    F, C = num_frames, channels
    b = np.frombuffer(buf, dtype=np.uint8)
    n_samples = np.zeros(F, np.int32)
    sf = {k: np.zeros(F * C, np.int32)
          for k in ("channel", "sftype", "order", "k_coeff", "nw_coeff",
                    "k_res", "k_res4", "nw_res")}
    cap = max((len(buf) - pos) // 4 + 1, 1)
    coeff_words = np.zeros(cap, np.uint32)
    res_words = np.zeros(cap, np.uint32)
    ct = ctypes.c_int64(0)
    rt = ctypes.c_int64(0)
    end = _lib.sela_scan_frames(
        b, len(buf), pos, F, C, sync, max_samples,
        n_samples, sf["channel"], sf["sftype"], sf["order"], sf["k_coeff"],
        sf["nw_coeff"], sf["k_res"], sf["k_res4"], sf["nw_res"],
        coeff_words, ctypes.byref(ct), res_words, ctypes.byref(rt),
    )
    if end < 0:
        raise ValueError(f"container structure error at byte {-end - 1}")
    sf["n_samples"] = n_samples
    sf["coeff_words"] = coeff_words[: ct.value].copy()
    sf["res_words"] = res_words[: rt.value].copy()
    return sf, int(end)


def emit_frames(num_frames: int, channels: int, sync: int,
                n_samples: np.ndarray, sf_channel: np.ndarray,
                sf_type: np.ndarray, sf_order: np.ndarray,
                sf_kc: np.ndarray, sf_nwc: np.ndarray, sf_kr: np.ndarray,
                sf_nwr: np.ndarray, coeff_words: np.ndarray,
                res_words: np.ndarray,
                sf_kr4: np.ndarray | None = None) -> bytes:
    """Native frame serialization; exact inverse of scan_frames."""
    from ..format import RESIDUE_PARTS, RICE_PARTITION_MARKER

    a32 = lambda x: np.ascontiguousarray(x, dtype=np.int32)
    kr = a32(sf_kr)
    kr4 = _ks4_arr(sf_kr4, len(kr))
    n_part = int((kr == RICE_PARTITION_MARKER).sum())
    total = int(
        6 * num_frames + 11 * num_frames * channels
        + RESIDUE_PARTS * n_part
        + 4 * (int(np.asarray(sf_nwc, np.int64).sum())
               + int(np.asarray(sf_nwr, np.int64).sum()))
    )
    out = np.zeros(total, np.uint8)
    n = _lib.sela_emit_frames(
        num_frames, channels, sync, a32(n_samples), a32(sf_channel),
        a32(sf_type), a32(sf_order), a32(sf_kc), a32(sf_nwc), kr, kr4,
        a32(sf_nwr),
        np.ascontiguousarray(coeff_words, np.uint32),
        np.ascontiguousarray(res_words, np.uint32), out,
    )
    assert n == total, (n, total)
    return out.tobytes()
