"""Rice coder device ops: zigzag, exact optimal-k search, exact bit costs.

Batched jnp over [B, N] value blocks with per-row valid counts. The k search
is bit-exact against sela_tpu.ref.rice.optimal_k (including tie-breaking to
the lowest k and the verbatim escape), so a device-planned stream matches the
oracle's bytes given the same residues.

The actual bit packing is host-side (sela_tpu.native C++ fast path with a
numpy fallback) — bit-serial packing is the one stage that does not map to
the VPU profitably at current sizes; see SURVEY.md SS7 "hard parts".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..format import RICE_K_ESCAPE, RICE_K_MAX
from . import i64


def zigzag(v: jax.Array) -> jax.Array:
    """int32 -> uint32 zigzag."""
    v = v.astype(jnp.int32)
    return jax.lax.bitcast_convert_type(
        (v << 1) ^ jax.lax.shift_right_arithmetic(v, 31), jnp.uint32
    )


def unzigzag(u: jax.Array) -> jax.Array:
    """uint32 -> int32."""
    half = (u >> 1).astype(jnp.uint32)
    res = jnp.where((u & jnp.uint32(1)) != 0, ~half, half)
    return jax.lax.bitcast_convert_type(res, jnp.int32)


def _sum_u32_exact(v: jax.Array, valid: jax.Array) -> i64.I64:
    """Exact sum over axis -1 of uint32 values (masked), as an i64 pair.

    Splits into 16-bit halves; each half-sum stays < 2^27 for N <= 2048."""
    mask16 = jnp.uint32(0xFFFF)
    v = jnp.where(valid, v, jnp.uint32(0))
    lo = jnp.sum(v & mask16, axis=-1, dtype=jnp.uint32)
    hi = jnp.sum(v >> 16, axis=-1, dtype=jnp.uint32)
    # total = hi * 2^16 + lo; hi can reach 2^27 so hi*2^16 needs both words
    hi_pair = jax.lax.bitcast_convert_type(hi >> 16, jnp.int32)
    lo_pair = hi << 16
    return i64.add(i64.I64(hi_pair, lo_pair),
                   i64.I64(jnp.zeros_like(hi_pair), lo))


def optimal_k_and_bits(u: jax.Array, n_valid: jax.Array,
                       k_max: int = RICE_K_MAX):
    """[B, N] zigzag values + [B] counts -> (k [B] int32, bits [B] int32).

    C(k) = sum(u >> k) + n*(k+1) minimized over k in [0, k_max]; ties go
    to the lowest k; escape to k=31 (verbatim, 32n bits) when min C > 32n.
    Exact 64-bit cost arithmetic — bit-identical to the oracle.
    """
    B, N = u.shape
    valid = jnp.arange(N)[None, :] < n_valid[:, None]
    best_k = jnp.zeros(B, jnp.int32)
    best_c = i64.const(1 << 62, (B,))
    for k in range(k_max + 1):
        s = _sum_u32_exact(u >> k, valid)
        c = i64.add(s, i64.from_i32((n_valid * (k + 1)).astype(jnp.int32)))
        better = i64.lt(c, best_c)
        best_k = jnp.where(better, k, best_k)
        best_c = i64.where(better, c, best_c)
    verb = i64.from_i32((32 * n_valid).astype(jnp.int32))
    escape = i64.lt(verb, best_c)  # min C > 32n  <=>  32n < C
    k = jnp.where(escape, RICE_K_ESCAPE, best_k)
    bits = jnp.where(escape, 32 * n_valid, i64.saturate_i32(best_c))
    # zero-count rows: k=0, bits=0
    empty = n_valid == 0
    return jnp.where(empty, 0, k).astype(jnp.int32), jnp.where(empty, 0, bits).astype(jnp.int32)


def k_and_bits_from_sums(sums: i64.I64, n_valid: jax.Array,
                         k_max: int = RICE_K_MAX):
    """(k, bits) from precomputed per-k cost sums (Pallas fused-encode path).

    sums: I64 of shape [B, >=k_max+1] where column k holds sum(u >> k) over
    the valid values of row B. Selection logic (ties to lowest k, verbatim
    escape, empty-row zeroing) is identical to optimal_k_and_bits.
    """
    B = n_valid.shape[0]
    n_valid = n_valid.astype(jnp.int32)
    best_k = jnp.zeros(B, jnp.int32)
    best_c = i64.const(1 << 62, (B,))
    for k in range(k_max + 1):
        s = i64.I64(sums.hi[:, k], sums.lo[:, k])
        c = i64.add(s, i64.from_i32((n_valid * (k + 1)).astype(jnp.int32)))
        better = i64.lt(c, best_c)
        best_k = jnp.where(better, k, best_k)
        best_c = i64.where(better, c, best_c)
    verb = i64.from_i32((32 * n_valid).astype(jnp.int32))
    escape = i64.lt(verb, best_c)
    k = jnp.where(escape, RICE_K_ESCAPE, best_k)
    bits = jnp.where(escape, 32 * n_valid, i64.saturate_i32(best_c))
    empty = n_valid == 0
    return (
        jnp.where(empty, 0, k).astype(jnp.int32),
        jnp.where(empty, 0, bits).astype(jnp.int32),
    )


def block_words(bits: jax.Array) -> jax.Array:
    """ceil(bits / 32) — number of u32 words for a block."""
    return (bits + 31) >> 5


def plan_blocks(values: jax.Array, n_valid: jax.Array,
                k_max: int = RICE_K_MAX):
    """Convenience: int32 value blocks -> (k, bits, nwords), all [B] int32."""
    u = zigzag(values)
    valid = jnp.arange(values.shape[1])[None, :] < n_valid[:, None]
    u = jnp.where(valid, u, jnp.uint32(0))
    k, bits = optimal_k_and_bits(u, n_valid.astype(jnp.int32), k_max)
    return k, bits, block_words(bits)
