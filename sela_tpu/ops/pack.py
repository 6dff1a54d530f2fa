"""On-device Rice bit packing — the two-phase plan from SURVEY.md §2.

Produces, entirely on device, the same MSB-first u32 word stream as the host
packer (native/bitio.cpp `rice_pack_blocks` / ref.rice.encode) for plain
(non-partitioned, non-escape) blocks:

  phase 1: per-value code lengths  len_i = (u_i >> k) + 1 + k  and their
           exclusive prefix sum = global bit offsets (vectorized);
  phase 2: the normative code is q unary ONES, a 0 stop bit, then k
           remainder bits (ref.rice._pack_bits). The COMPLEMENT of that
           stream is zeros for the whole unary run, 1 at the stop, and
           ~rem — i.e. per value a single (k+1)-bit pattern
           `(1 << k) | (~u & (2^k - 1))` spanning at most TWO words, with
           every other bit zero. Scatter those patterns (split into hi/lo
           word contributions), reduce per word with a wrapping uint32
           cumulative sum — contributions to one word have disjoint bits,
           so OR == ADD and the mod-2^32 prefix wrap cancels in the
           segment difference — then invert and mask to the valid bit
           count. Boundaries come from jnp.searchsorted over the
           (monotonic) first-word indices.

The unary run — unbounded per value, the reason bit packing looks serial —
needs no per-bit work at all in complement space, which is what makes Rice
(unlike arithmetic coding) bit-scatterable on a SIMD machine with no
sequential bit cursor.

Measured A/B vs the host packer is recorded per round in BENCH detail
(`device_pack`); see bench.bench_device_pack. The production encode path
keeps whichever side the numbers favor (VERDICT r4 item 3).

Parity target: upstream:src/rice/rice_encoder.cpp (sahaRatul/sela,
path-level cite — mount empty, SURVEY.md §2 Rice encoder row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..format import RICE_K_MAX


@functools.partial(jax.jit, static_argnames=("max_words",))
def pack_blocks_device(u: jax.Array, k: jax.Array, n_valid: jax.Array,
                       max_words: int):
    """[B, N] zigzag values (zeroed beyond n_valid) + [B] k -> word stream.

    Returns (words [B, max_words] uint32, nwords [B] int32). Blocks whose
    k is the verbatim escape (31) or the partition marker are NOT handled
    here (the caller routes those to the host packer); k must be <=
    RICE_K_MAX. Bits beyond a block's bit count are zero, matching the host
    packer's zero padding, so words[b, :nwords[b]] is byte-identical to
    ref.rice.encode(values, k)[1].
    """
    B, N = u.shape
    u = u.astype(jnp.uint32)
    k = k.astype(jnp.uint32)[:, None]
    n_valid = n_valid.astype(jnp.int32)
    valid = jnp.arange(N, dtype=jnp.int32)[None, :] < n_valid[:, None]

    q = (u >> k).astype(jnp.uint32)
    lens = jnp.where(valid, q + 1 + k, jnp.uint32(0))
    offs = jnp.cumsum(lens, axis=1, dtype=jnp.uint32) - lens  # exclusive
    total_bits = (offs[:, -1] + lens[:, -1]).astype(jnp.int32)
    nwords = (total_bits + 31) >> 5

    # complement-space pattern = stop-bit 1 | ~remainder: (k+1) bits ending
    # at global bit e = off + q + k (bit positions are MSB-first per word)
    kmask = (jnp.uint32(1) << k) - 1
    rem_c = jnp.where(k > 0, (~u) & kmask, jnp.uint32(0))
    pat = (jnp.uint32(1) << k) | rem_c
    s = offs + q                       # global bit index of the terminator
    w0 = (s >> 5).astype(jnp.int32)    # first word the pattern touches
    end = (s & 31) + k                 # last bit index within the word pair
    # both where-branches are evaluated: clamp shift amounts into [0, 31]
    # so the discarded branch never shifts out of range (end <= 61: k <= 30)
    sh_hi_l = jnp.clip(31 - end, 0, 31).astype(jnp.uint32)
    sh_hi_r = jnp.clip(end - 31, 0, 31).astype(jnp.uint32)
    sh_lo_l = jnp.clip(63 - end, 0, 31).astype(jnp.uint32)
    hi = jnp.where(end <= 31, pat << sh_hi_l, pat >> sh_hi_r).astype(jnp.uint32)
    lo = jnp.where(
        end <= 31, jnp.uint32(0), pat << sh_lo_l  # uint32 wrap keeps low bits
    ).astype(jnp.uint32)
    hi = jnp.where(valid, hi, 0)
    lo = jnp.where(valid, lo, 0)

    # per-word segment sums via wrapping cumsum differences: values are
    # sorted by w0 (offsets are strictly increasing), contributions to one
    # word occupy disjoint bits, so the segment ADD equals the OR and the
    # mod-2^32 prefix wrap cancels in the difference.
    ps_hi = jnp.cumsum(hi, axis=1, dtype=jnp.uint32)
    ps_lo = jnp.cumsum(lo, axis=1, dtype=jnp.uint32)
    wids = jnp.arange(max_words, dtype=jnp.int32)[None, :]

    def seg_sum(ps, first_word):
        """upto[b, w] = sum of contributions with first_word <= w."""
        idx = jax.vmap(
            lambda fw, t: jnp.searchsorted(fw, t, side="right")
        )(first_word, jnp.broadcast_to(wids, (B, max_words)))
        ps0 = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.uint32), ps], axis=1)
        return jnp.take_along_axis(ps0, idx, axis=1)

    # words[w] = (sum of hi with w0 == w) + (sum of lo with w0 + 1 == w)
    # expressed as differences of "sum of contributions with w0 <= w":
    upto_hi = seg_sum(ps_hi, w0)                     # [B, max_words]
    upto_lo = seg_sum(ps_lo, w0)
    prev_hi = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint32), upto_hi[:, :-1]], axis=1)
    prev2_lo = jnp.concatenate(
        [jnp.zeros((B, 2), jnp.uint32), upto_lo[:, :-2]], axis=1)
    prev1_lo = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint32), upto_lo[:, :-1]], axis=1)
    words_c = (upto_hi - prev_hi) + (prev1_lo - prev2_lo)

    # invert out of complement space, then zero the padding tail: word w
    # keeps its first clamp(total_bits - 32w, 0, 32) MSB-first bits
    bits_here = jnp.clip(
        total_bits[:, None] - 32 * wids, 0, 32).astype(jnp.uint32)
    sh = jnp.clip(jnp.uint32(32) - bits_here, 0, 31)  # both branches execute
    partial = ~((jnp.uint32(1) << sh) - 1)
    tail_mask = jnp.where(
        bits_here >= 32, jnp.uint32(0xFFFFFFFF),
        jnp.where(bits_here == 0, jnp.uint32(0), partial),
    )
    words = (~words_c) & tail_mask
    return words.astype(jnp.uint32), nwords


def pack_blocks_reference_shapes(values: jax.Array, k: jax.Array,
                                 n_valid: jax.Array, max_words: int):
    """Convenience wrapper taking signed residues (applies zigzag + mask)."""
    from . import rice as rice_ops

    u = rice_ops.zigzag(values)
    valid = jnp.arange(values.shape[1])[None, :] < n_valid[:, None]
    u = jnp.where(valid, u, jnp.uint32(0))
    return pack_blocks_device(u, k, n_valid, max_words)
