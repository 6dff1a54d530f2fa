"""Pallas IIR synthesis kernel — the decode hot loop (FORMAT.md, normative).

x[n] = e[n] + rshift_round(sum_j c_j * x[n-j], 20), strictly sequential in n
per row. TPU mapping: rows (frame-channels) are the parallel axis, laid out
on VPU lanes — each grid cell owns a [N, 128] time-major tile and walks n
with a hardware fori loop. The 64-bit MAC uses the same int32 hi/lo emulation
as the jnp path (sela_tpu.ops.i64), so results are bit-identical to the
oracle. The lax.scan version of this loop runs at ~5% VPU efficiency from
per-step XLA overhead; here the whole step body is a handful of vector
instructions.

Parity target: upstream:src/lpc/sample_generator.cpp (sahaRatul/sela,
path-level cite — mount empty, SURVEY.md SS2/SS3 "hot-loop ranking" no.1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format import MAX_ORDER, REF_Q
from ..ops import i64
from ..utils.platform import backend_is_tpu as _backend_is_tpu

LANES = 128
P = MAX_ORDER


def _reduce_rows_i64(v: i64.I64) -> i64.I64:
    """Exact sum over axis 0 (static power-of-two size) of an I64 array."""
    n = v.hi.shape[0]
    while n > 1:
        h = n // 2
        v = i64.add(
            i64.I64(v.hi[:h, :], v.lo[:h, :]),
            i64.I64(v.hi[h:, :], v.lo[h:, :]),
        )
        n = h
    return v


def _iir_kernel(et_ref, crev_ref, out_ref, hist):
    """One [N, LANES] tile: sequential n, 128 rows in parallel on lanes.

    et_ref:   [N, LANES] int32 residues, time-major
    crev_ref: [P, LANES] int32 reversed Q20 coeffs (crev[i] = c[P-1-i])
    out_ref:  [N, LANES] int32 reconstructed samples
    hist:     [P + N, LANES] int32 scratch; rows 0..P-1 are the zero history,
              row P+n holds x[n]
    """
    n_samples = et_ref.shape[0]
    hist[0:P, :] = jnp.zeros((P, LANES), jnp.int32)
    crev = crev_ref[:, :]

    def step(n, _):
        w = hist[pl.ds(n, P), :]                     # x[n-P .. n-1]
        prod = i64.mul_i32(crev, w)                  # [P, LANES] exact 64-bit
        acc = _reduce_rows_i64(prod)                 # [1, LANES]
        pred = i64.to_i32(i64.rshift_round(acc, REF_Q))
        x_n = et_ref[pl.ds(n, 1), :] + pred
        hist[pl.ds(n + P, 1), :] = x_n
        return 0

    jax.lax.fori_loop(0, n_samples, step, 0)
    out_ref[:, :] = hist[pl.ds(P, n_samples), :]


def _iir_kernel_fast(et_ref, crev_ref, out_ref, hist_l, hist_h):
    """Limb-decomposed step for |c| < 2^23, |x| < 2^26 (PCM <= 24-bit).

    c = ch*2^12 + cl, x = xh*2^13 + xl  =>  every partial product and every
    P-tap partial sum is int32-exact (FORMAT.md "Reflection -> direct-form"),
    so the whole 64-bit MAC reduces to 4 int32 multiplies + 4 plain reduces
    per step. The rounding shift also stays int32: with
    acc = s_hh*2^25 + s_hl*2^12 + s_lh*2^13 + s_ll,

      rshift_round(acc, 20) = (s_hh << 5) + (v >> 7)
                              + ((s_hl + (c2 >> 12)) >> 8)
      where u = s_ll + 2^19, v = s_lh + (u >> 13),
            c2 = ((v & 0x7F) << 13) | (u & 0x1FFF)

    — exact because each masked remainder is < the next shift's divisor, so
    no step's floor can be pushed over by the dropped fraction (same family
    of identities as the kernels/coeffs.py delta; bounds: |s_lh| <= 2^30-2^18
    so |v| < 2^30, everything else < 2^30). In-domain this equals the 64-bit
    result bit for bit, including the mod-2^32 truncation of to_i32 when a
    hostile-but-accepted stream overflows the prediction (int32 adds wrap the
    same way the low word does). Replacing the i64 epilogue chain (~38 vector
    ops/step) with these ~10 ops measured ~1.2x on the whole kernel.
    """
    n_samples = et_ref.shape[0]
    zeros = jnp.zeros((P, LANES), jnp.int32)
    hist_l[0:P, :] = zeros
    hist_h[0:P, :] = zeros
    crev = crev_ref[:, :]
    ch = jax.lax.shift_right_arithmetic(crev, 12)  # [-2^11, 2^11)
    cl = crev & 0xFFF                              # [0, 2^12)

    def step(n, _):
        wl = hist_l[pl.ds(n, P), :]                # xl of x[n-P .. n-1]
        wh = hist_h[pl.ds(n, P), :]                # xh
        s_hh = jnp.sum(ch * wh, axis=0, keepdims=True)  # each |sum| < 2^29
        s_hl = jnp.sum(ch * wl, axis=0, keepdims=True)
        s_lh = jnp.sum(cl * wh, axis=0, keepdims=True)
        s_ll = jnp.sum(cl * wl, axis=0, keepdims=True)
        u = s_ll + jnp.int32(1 << 19)
        v = s_lh + (u >> 13)
        c2 = ((v & 0x7F) << 13) | (u & 0x1FFF)
        pred = (s_hh << 5) + jax.lax.shift_right_arithmetic(v, 7) + (
            jax.lax.shift_right_arithmetic(s_hl + (c2 >> 12), 8)
        )
        x_n = et_ref[pl.ds(n, 1), :] + pred
        hist_l[pl.ds(n + P, 1), :] = x_n & 0x1FFF
        hist_h[pl.ds(n + P, 1), :] = jax.lax.shift_right_arithmetic(x_n, 13)
        out_ref[pl.ds(n, 1), :] = x_n
        return 0

    jax.lax.fori_loop(0, n_samples, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _iir_tiles_fast(et: jax.Array, crev: jax.Array, interpret: bool):
    N, Bp = et.shape
    grid = (Bp // LANES,)
    return pl.pallas_call(
        _iir_kernel_fast,
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((P + N, LANES), jnp.int32),
            pltpu.VMEM((P + N, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(et, crev)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _iir_tiles(et: jax.Array, crev: jax.Array, interpret: bool):
    """et: [N, Bp] int32, crev: [P, Bp]; Bp a multiple of LANES."""
    N, Bp = et.shape
    grid = (Bp // LANES,)
    return pl.pallas_call(
        _iir_kernel,
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P + N, LANES), jnp.int32)],
        interpret=interpret,
    )(et, crev)


def iir_synthesize_pallas(e: jax.Array, coeffs: jax.Array,
                          interpret: bool | None = None,
                          fast: bool = True) -> jax.Array:
    """Drop-in replacement for ops.filters.iir_synthesize.

    e: [B, N] int32 residues; coeffs: [B, P] int32 Q20 (zero beyond order).
    fast=True uses the limb-decomposed kernel — exact for any PCM <= 24-bit
    (|x| < 2^26; coeffs are spec-bounded to 2^23). Use fast=False (generic
    64-bit hi/lo kernel) for 32-bit PCM.
    """
    if interpret is None:
        interpret = not _backend_is_tpu()
    B, N = e.shape
    pad = (-B) % LANES
    if pad:
        e = jnp.pad(e, ((0, pad), (0, 0)))
        coeffs = jnp.pad(coeffs, ((0, pad), (0, 0)))
    et = e.T                                   # [N, Bp] time-major
    crev = coeffs[:, ::-1].T                   # [P, Bp]
    tiles = _iir_tiles_fast if fast else _iir_tiles
    xt = tiles(et, crev, interpret)
    x = xt.T
    return x[:B] if pad else x
