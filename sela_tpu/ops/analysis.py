"""Batched float LPC analysis — jnp over dense [B, N] int32 signal batches.

TPU-native replacement for upstream:src/lpc/residue_generator.cpp's scalar
analysis loop (sahaRatul/sela, path-level cite — mount empty, SURVEY.md SS2):
autocorrelation as lag-shifted reductions, Levinson-Durbin as a lax.scan over
order (static MAX_ORDER steps) vmapped over the batch, order selection and
companded quantization as vectorized int/float ops.

Float analysis is NON-normative (FORMAT.md "Design invariant"): it only picks
the stream the encoder emits; any conforming decoder reconstructs exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..format import COEFF_BIT_COST, MAX_ORDER, Q_CLAMP_HI, Q_CLAMP_LO


def autocorr(x: jax.Array, max_lag: int = MAX_ORDER) -> jax.Array:
    """[B, N] int32 (zero-padded rows) -> [B, max_lag+1] float32.

    Normalizing by r[0] downstream makes the scale irrelevant; computing in
    float32 over pre-scaled samples keeps accumulation error small enough for
    the 7-bit coefficient quantizer.
    """
    xf = x.astype(jnp.float32) * (1.0 / 32768.0)  # scale-free; avoids f32 range loss
    n = x.shape[-1]
    cols = []
    for lag in range(max_lag + 1):
        if lag == 0:
            cols.append(jnp.sum(xf * xf, axis=-1))
        else:
            cols.append(jnp.sum(xf[..., : n - lag] * xf[..., lag:], axis=-1))
    return jnp.stack(cols, axis=-1)


def levinson(r: jax.Array, order: int = MAX_ORDER):
    """Batched Levinson-Durbin.

    r: [B, order+1] float32 -> (gamma [B, order], err [B, order+1]).
    lax.scan over order with carry (a, e); step m computes the reflection
    coefficient from the current direct-form coeffs.
    """
    B = r.shape[0]
    r0 = r[:, 0]
    valid = r0 > 0.0
    e0 = jnp.where(valid, r0, 1.0)

    def step(carry, m):
        a, e = carry  # a: [B, order] (a[j] = coeff j+1), e: [B]
        # acc = r[m] - sum_{j=1..m-1} a_j * r[m-j]
        idx = m - 1 - jnp.arange(order)  # r index m-(j+1) for slot j
        rshifted = jnp.take_along_axis(
            r, jnp.clip(idx, 0, order)[None, :].repeat(B, 0), axis=1
        )
        mask = (jnp.arange(order) < (m - 1))[None, :]
        acc = r[:, 0] * 0.0 + jnp.take_along_axis(r, jnp.full((B, 1), m), axis=1)[:, 0]
        acc = acc - jnp.sum(jnp.where(mask, a * rshifted, 0.0), axis=-1)
        k = jnp.where(e > 0.0, acc / jnp.maximum(e, 1e-30), 0.0)
        k = jnp.clip(k, -0.999999, 0.999999)
        # a'_j = a_j - k * a_{m-j} ; a'_m = k
        a_rev = jnp.take_along_axis(
            a, jnp.clip(m - 2 - jnp.arange(order), 0, order - 1)[None, :].repeat(B, 0),
            axis=1,
        )
        a_new = jnp.where(mask, a - k[:, None] * a_rev, a)
        a_new = jnp.where((jnp.arange(order) == (m - 1))[None, :], k[:, None], a_new)
        e_new = e * (1.0 - k * k)
        return (a_new, e_new), (k, e_new)

    init = (jnp.zeros((B, order), jnp.float32), e0)
    _, (ks, es) = jax.lax.scan(step, init, jnp.arange(1, order + 1))
    gamma = jnp.where(valid[None, :], ks, 0.0).T  # [B, order]
    err = jnp.concatenate([e0[:, None], jnp.where(valid[None, :], es, e0[None, :]).T], axis=1)
    err = jnp.where(valid[:, None], err, jnp.ones_like(err))
    return gamma, err


def select_order(err: jax.Array, n_valid: jax.Array) -> jax.Array:
    """[B, order+1] err, [B] sample counts -> [B] chosen order.

    cost(m) = N/2 * log2(max(err_m, tiny)) + COEFF_BIT_COST * m  (oracle rule).
    """
    tiny = 1e-9
    m = jnp.arange(err.shape[1], dtype=jnp.float32)[None, :]
    nf = n_valid.astype(jnp.float32)[:, None]
    cost = 0.5 * nf * jnp.log2(jnp.maximum(err, tiny)) + COEFF_BIT_COST * m
    return jnp.argmin(cost, axis=-1).astype(jnp.int32)


def quantize_reflection(gamma: jax.Array) -> jax.Array:
    """[B, order] float -> [B, order] int32 companded 7-bit values (FORMAT.md)."""
    g = gamma
    q_first = jnp.floor(64.0 * (jnp.sqrt(2.0 * (g[:, 0] + 1.0)) - 1.0))
    q = jnp.floor(64.0 * g)
    if g.shape[1] >= 2:
        q_second = jnp.floor(64.0 * (jnp.sqrt(2.0 * (1.0 - g[:, 1])) - 1.0))
        q = q.at[:, 1].set(q_second)
    q = q.at[:, 0].set(q_first)
    return jnp.clip(q, Q_CLAMP_LO, Q_CLAMP_HI).astype(jnp.int32)


def analyze(x: jax.Array, n_valid: jax.Array):
    """Full analysis: [B, N] int32, [B] counts -> (order [B], qcoeffs [B, MAX_ORDER])."""
    r = autocorr(x)
    gamma, err = levinson(r)
    order = select_order(err, n_valid)
    q = quantize_reflection(gamma)
    # zero out coefficients beyond the chosen order
    q = jnp.where(jnp.arange(q.shape[1])[None, :] < order[:, None], q, 0)
    return order, q
