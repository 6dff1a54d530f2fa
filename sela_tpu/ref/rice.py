"""Rice/Golomb entropy coder — numpy oracle (normative, see FORMAT.md SSRice).

Capability parity target: upstream:src/rice/rice_encoder.cpp /
rice_decoder.cpp (sahaRatul/sela, path-level cite — mount empty, SURVEY.md SS2).

Bit conventions (frozen):
  * zigzag: u = (v << 1) ^ (v >> 31) in u32 (INT_MIN wraps correctly)
  * per value, k <= 30: (u >> k) one-bits, a zero bit, low k bits of u MSB-first
  * k == 31 (escape): all 32 bits of u MSB-first, no unary part
  * bit i of the stream is bit 31 - (i % 32) of u32 word i // 32
"""
from __future__ import annotations

import numpy as np

from ..format import RICE_K_ESCAPE, RICE_K_MAX

U32 = 0xFFFFFFFF


def zigzag(v: np.ndarray) -> np.ndarray:
    """int32 array -> uint32 array (as uint64 for safe arithmetic)."""
    vi = np.asarray(v, dtype=np.int64)
    return (((vi << 1) ^ (vi >> 63)) & U32).astype(np.uint64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    """uint32-valued array -> int32 array."""
    u = np.asarray(u, dtype=np.uint64)
    half = (u >> np.uint64(1)).astype(np.uint32)
    odd = (u & np.uint64(1)).astype(bool)
    return np.where(odd, ~half, half).astype(np.uint32).view(np.int32)


def optimal_k(u: np.ndarray, k_max: int = RICE_K_MAX) -> int:
    """Minimize C(k) = sum(u >> k) + n*(k+1) over k in [0, k_max].

    Returns RICE_K_ESCAPE when even the best Rice cost exceeds verbatim
    storage (32 bits/value).
    """
    n = len(u)
    if n == 0:
        return 0
    u = np.asarray(u, dtype=np.uint64)
    ks = np.arange(k_max + 1, dtype=np.uint64)
    costs = (u[None, :] >> ks[:, None]).sum(axis=1) + n * (ks + 1)
    best = int(np.argmin(costs))
    if costs[best] > 32 * n:
        return RICE_K_ESCAPE
    return best


def bit_lengths(u: np.ndarray, k: int) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    if k == RICE_K_ESCAPE:
        return np.full(len(u), 32, dtype=np.int64)
    return ((u >> np.uint64(k)) + 1 + k).astype(np.int64)


def encode(values: np.ndarray, k: int | None = None,
           k_max: int = RICE_K_MAX) -> tuple[int, np.ndarray]:
    """Encode int32 values; returns (k, uint32 words)."""
    values = np.asarray(values, dtype=np.int32)
    u = zigzag(values)
    if k is None:
        k = optimal_k(u, k_max)
    n = len(u)
    if n == 0:
        return k, np.zeros(0, dtype=np.uint32)

    lens = bit_lengths(u, k)
    offs = np.concatenate([[0], np.cumsum(lens)])
    total = int(offs[-1])
    if total > (1 << 28):
        # only reachable by FORCING k far below optimal (optimal-k planning
        # escapes to verbatim at 32 bits/value); the difference-array packer
        # below allocates O(total bits), so refuse instead of swapping
        raise ValueError(
            f"forced k={k} yields {total} bits for {n} values — "
            "use optimal k (escape caps the stream at 32 bits/value)"
        )
    nbits_padded = -(-total // 32) * 32
    bits = np.zeros(nbits_padded, dtype=np.uint8)

    if k == RICE_K_ESCAPE:
        q = np.zeros(n, dtype=np.int64)
        rem_bits = 32
    else:
        q = (u >> np.uint64(k)).astype(np.int64)
        rem_bits = k
        # unary run of q ones starting at offs[i]: disjoint ranges via
        # difference-array + cumsum
        delta = np.zeros(nbits_padded + 1, dtype=np.int64)
        starts = offs[:-1]
        np.add.at(delta, starts, 1)
        np.add.at(delta, starts + q, -1)
        bits |= (np.cumsum(delta[:-1]) > 0).astype(np.uint8)
        # the stop (zero) bit at starts + q is already 0

    if rem_bits > 0:
        stop = 0 if k == RICE_K_ESCAPE else 1
        pos = (offs[:-1] + q + stop)[:, None] + np.arange(rem_bits)
        shifts = np.uint64(rem_bits - 1) - np.arange(rem_bits, dtype=np.uint64)
        vals = ((u[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        bits[pos.ravel()] = vals.ravel()

    packed = np.packbits(bits)  # MSB-first bytes
    words = packed.view(">u4").astype(np.uint32)
    return k, words


def words_to_bits(words: np.ndarray) -> np.ndarray:
    """uint32 words -> uint8 bit array (MSB-first per word)."""
    be = np.ascontiguousarray(np.asarray(words, dtype=np.uint32)).astype(">u4")
    return np.unpackbits(np.frombuffer(be.tobytes(), dtype=np.uint8))


def decode(words: np.ndarray, count: int, k: int) -> np.ndarray:
    """Decode `count` int32 values from uint32 words with parameter k."""
    if count == 0:
        return np.zeros(0, dtype=np.int32)
    bits = words_to_bits(words)

    if k == RICE_K_ESCAPE:
        b = bits[: count * 32].reshape(count, 32).astype(np.uint64)
        shifts = np.uint64(31) - np.arange(32, dtype=np.uint64)
        u = (b << shifts[None, :]).sum(axis=1)
        return unzigzag(u)

    zero_pos = np.flatnonzero(bits == 0)
    u = np.zeros(count, dtype=np.uint64)
    pos = 0
    shifts = np.uint64(k - 1) - np.arange(k, dtype=np.uint64) if k else None
    nbits = len(bits)
    for i in range(count):
        # first zero bit at/after pos terminates the unary run; a corrupted/
        # truncated stream may have none left — treat the stream end as the
        # terminator and pad missing remainder bits with zeros (same
        # semantics as the native BitReader: garbage in, bounded garbage out,
        # never an out-of-bounds access)
        zi = np.searchsorted(zero_pos, pos, side="left")
        stop = int(zero_pos[zi]) if zi < len(zero_pos) else nbits
        q = max(stop - pos, 0)
        if k > 0:
            rem_bits = bits[stop + 1 : stop + 1 + k].astype(np.uint64)
            if len(rem_bits) < k:
                rem_bits = np.concatenate(
                    [rem_bits, np.zeros(k - len(rem_bits), np.uint64)]
                )
            rem = int((rem_bits << shifts).sum())
        else:
            rem = 0
        # uint32 wrap-around exactly like the native packer's 32-bit math
        u[i] = ((q << k) | rem) & U32
        pos = stop + 1 + k
    return unzigzag(u)


def encoded_cost_bits(values: np.ndarray) -> tuple[int, int]:
    """(k, total bits) for the optimal encoding of `values`."""
    u = zigzag(np.asarray(values, dtype=np.int32))
    k = optimal_k(u)
    return k, int(bit_lengths(u, k).sum())
