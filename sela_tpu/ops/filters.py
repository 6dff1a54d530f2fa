"""Q20 prediction filters — batched jnp over [B, N] rows (FORMAT.md, normative).

Encode (FIR) is embarrassingly parallel over samples: 32 static lag-shifted
i64 multiply-accumulates, fully vectorized — XLA fuses the whole chain into
one elementwise loop over the batch (TPU VPU).

Decode (IIR) is strictly sequential per row: a lax.scan over time with an
int32 history carry, parallel across the batch dimension. This is the slow
reference path; sela_tpu.kernels.iir provides the Pallas version with the
same bit-exact semantics.

Capability parity: upstream:src/lpc/residue_generator.cpp (calc residues) and
sample_generator.cpp (synthesis) — sahaRatul/sela, path-level cite, mount
empty (SURVEY.md SS2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..format import MAX_ORDER, REF_Q, RESIDUE_LIMIT
from . import i64


def fir_residues_fast(x: jax.Array, coeffs: jax.Array, order: jax.Array,
                      n_valid: jax.Array):
    """Limb-decomposed FIR for |x| < 2^26 (PCM <= 24-bit incl. side channel).

    Same decomposition as the Pallas decode kernel (FORMAT.md): with the
    spec's |c| <= 2^23 saturation, c = ch*2^12 + cl and x = xh*2^13 + xl give
    int32-exact partial products and 32-tap partial sums — 4 int32 MACs per
    tap instead of the ~30-op generic 64-bit emulation, one i64 recombination
    per sample. Bit-identical to fir_residues on its domain (tested).
    """
    B, N = x.shape
    P = coeffs.shape[1]
    xh = jax.lax.shift_right_arithmetic(x, 13)
    xl = x & 0x1FFF
    s_hh = jnp.zeros((B, N), jnp.int32)
    s_hl = jnp.zeros((B, N), jnp.int32)
    s_lh = jnp.zeros((B, N), jnp.int32)
    s_ll = jnp.zeros((B, N), jnp.int32)
    for j in range(1, P + 1):
        xh_s = jnp.pad(xh[:, : N - j], ((0, 0), (j, 0)))
        xl_s = jnp.pad(xl[:, : N - j], ((0, 0), (j, 0)))
        chj = coeffs[:, j - 1 : j] >> 12
        clj = coeffs[:, j - 1 : j] & 0xFFF
        s_hh = s_hh + chj * xh_s
        s_hl = s_hl + chj * xl_s
        s_lh = s_lh + clj * xh_s
        s_ll = s_ll + clj * xl_s
    acc = i64.add(
        i64.add(i64.shl(i64.from_i32(s_hh), 25), i64.shl(i64.from_i32(s_hl), 12)),
        i64.add(i64.shl(i64.from_i32(s_lh), 13), i64.from_i32(s_ll)),
    )
    pred = i64.rshift_round(acc, REF_Q)
    e = i64.sub(i64.from_i32(x), pred)
    valid = jnp.arange(N)[None, :] < n_valid[:, None]
    ok = jnp.all(~valid | i64.abs_lt_pow2(e, 30), axis=-1)
    e32 = jnp.where(ok[:, None] & valid, i64.to_i32(e), jnp.where(valid, x, 0))
    eff_order = jnp.where(ok, order, 0).astype(jnp.int32)
    return e32, eff_order


def fir_residues(x: jax.Array, coeffs: jax.Array, order: jax.Array, n_valid: jax.Array):
    """e[n] = x[n] - rshift_round(sum_j c_j * x[n-j], Q), zero-padded history.

    x: [B, N] int32 (rows zero-padded beyond n_valid), coeffs: [B, P] int32
    Q20 (zero beyond order), order: [B], n_valid: [B].
    Returns (e [B, N] int32 with zeros beyond n_valid, eff_order [B]) where
    eff_order drops to 0 for rows hitting the RESIDUE_LIMIT guard (then e = x,
    verbatim fallback). Only samples n < n_valid participate in the guard,
    matching the oracle which operates on exact-length arrays.
    """
    B, N = x.shape
    P = coeffs.shape[1]
    acc = i64.zeros((B, N))
    for j in range(1, P + 1):
        xs = jnp.pad(x[:, : N - j], ((0, 0), (j, 0)))  # x[n-j], zeros for n<j
        acc = i64.add(acc, i64.mul_i32(jnp.broadcast_to(coeffs[:, j - 1 : j], (B, N)), xs))
    pred = i64.rshift_round(acc, REF_Q)
    e = i64.sub(i64.from_i32(x), pred)
    valid = jnp.arange(N)[None, :] < n_valid[:, None]
    ok = jnp.all(~valid | i64.abs_lt_pow2(e, 30), axis=-1)
    e32 = jnp.where(ok[:, None] & valid, i64.to_i32(e), jnp.where(valid, x, 0))
    eff_order = jnp.where(ok, order, 0).astype(jnp.int32)
    return e32, eff_order


def iir_synthesize(e: jax.Array, coeffs: jax.Array):
    """x[n] = e[n] + rshift_round(sum_j c_j * x[n-j], Q) — scan over time.

    e: [B, N] int32, coeffs: [B, P] int32 Q20 (zero beyond order).
    History is an int32 [B, P] carry (hist[:, j] = x[n-1-j]).
    """
    B, N = e.shape
    P = coeffs.shape[1]

    def step(hist, e_t):
        # prediction: sum_j c_{j+1} * hist[:, j]
        acc = i64.zeros((B,))
        for j in range(P):
            acc = i64.add(acc, i64.mul_i32(coeffs[:, j], hist[:, j]))
        pred = i64.to_i32(i64.rshift_round(acc, REF_Q))
        x_t = e_t + pred  # int32; spec guarantees e was produced s.t. x fits
        hist = jnp.concatenate([x_t[:, None], hist[:, :-1]], axis=1)
        return hist, x_t

    hist0 = jnp.zeros((B, P), jnp.int32)
    _, xs = jax.lax.scan(step, hist0, e.T)  # scan over N
    return xs.T
