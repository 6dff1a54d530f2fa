"""Normative integer coefficient pipeline — batched jnp (FORMAT.md).

Mirrors sela_tpu.ref.lpc's integer half exactly: Q20 dequantization of
companded reflection coefficients and the integer Levinson recursion with
per-step int32 saturation (int64 emulated as i64 pairs). Bit-identical to the
oracle for every input by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..format import REF_Q
from . import i64


def dequantize_reflection(q: jax.Array) -> jax.Array:
    """[B, P] int32 quantized -> [B, P] int32 Q20 reflection coefficients.

    m=1: 128*(q+64)^2 - 2^20 ; m=2: 2^20 - 128*(q+64)^2 ; m>=3: q*16384.
    All values fit int32 (|g| < 2^21).
    """
    q = q.astype(jnp.int32)
    sq = 128 * (q + 64) * (q + 64)
    one = jnp.int32(1 << REF_Q)
    g = q * 16384
    col = jnp.arange(q.shape[-1])[None, :]
    g = jnp.where(col == 0, sq - one, g)
    g = jnp.where(col == 1, one - sq, g)
    return g


def reflection_to_lpc(g: jax.Array, order: jax.Array) -> jax.Array:
    """Integer Levinson: [B, P] Q20 reflection + [B] order ->
    [B, P] int32 Q20 direct-form coeffs (slots >= order stay zero).

    a'_i = SAT(a_i - rshift_round(k_m * a_{m-1-i}, 20)) for i < m-1 with
    SAT = clamp to [-2^23, 2^23-1]; a'_{m-1} = k_m. Static unroll over P
    steps (P = MAX_ORDER = 32), each masked by m <= order. NORMATIVE.
    """
    B, P = g.shape
    cols = jnp.arange(P)[None, :]
    g = jnp.where(cols < order[:, None], g, 0)
    a = jnp.zeros((B, P), jnp.int32)
    sat_lo, sat_hi = jnp.int32(-(1 << 23)), jnp.int32((1 << 23) - 1)
    for m in range(1, P + 1):
        k = g[:, m - 1]  # [B] Q20, |k| < 2^21
        active = (m <= order)[:, None]
        if m > 1:
            rev_idx = jnp.clip(m - 2 - jnp.arange(P), 0, P - 1)
            a_rev = a[:, rev_idx]
            prod = i64.mul_i32(jnp.broadcast_to(k[:, None], (B, P)), a_rev)
            delta = i64.rshift_round(prod, REF_Q)
            a_new = jnp.clip(
                i64.saturate_i32(i64.sub(i64.from_i32(a), delta)), sat_lo, sat_hi
            )
            mask_tap = (cols < (m - 1)) & active
            a = jnp.where(mask_tap, a_new, a)
        a = jnp.where((cols == (m - 1)) & active, k[:, None], a)
    return a
