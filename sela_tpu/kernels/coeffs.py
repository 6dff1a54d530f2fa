"""Pallas kernel: Q20 dequantize + integer Levinson, one lane per row.

The normative reflection->direct-form conversion (FORMAT.md "Reflection ->
direct-form coefficients"; parity target upstream:src/lpc/linear_predictor.cpp
— sahaRatul/sela, path-level cite, mount empty) runs on BOTH hot paths:
encode render (before the FIR) and decode (before the IIR). The jnp version
(ops.coeffs.reflection_to_lpc) is ~32 sequential steps of small [B, 32] HBM
ops with a per-step lane gather — on TPU it is HBM-latency bound (measured
~2.2 ms at B=8192, a third of decode_step). Here the whole recursion runs on
lane-resident vectors: one HBM read of q^T, one write of c^T, the reversal
a[m-1-i] is static register indexing, and the 64-bit product+round collapses
to ~12 int32 ops via an exact limb identity:

  k = kh*2^11 + kl, a = ah*2^12 + al (arithmetic-shift/mask split), then
  rshift_round(k*a, 20) = (kh*ah << 3) + ((kh*al + 2*kl*ah + u>>11) >> 9)
  with u = kl*al + 2^19 — every intermediate int32-exact given the spec
  bounds |k| <= 2^20 (valid dequantized reflection) and |a| <= 2^23 (SAT).

Exactness domain: bit-identical to ops.coeffs for any q with the in-kernel
clamp |g| <= 2^20 a no-op — i.e. every valid stream (q in [-64, 63] always
dequantizes inside it). Out-of-range q never reaches this kernel anymore:
every decode path rejects it at unpack (FORMAT.md §Decoder validation,
ref.frame.check_coeff_range — ADVICE r4); the clamp stays as defense in
depth for direct library callers.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format import MAX_ORDER, REF_Q
from ..utils.platform import backend_is_tpu as _backend_is_tpu

P = MAX_ORDER
LANES_LPC = int(os.environ.get("SELA_LPC_LANES", "512"))
_G_LIM = 1 << REF_Q                      # |g| <= 2^20 for every valid q
_SAT_LO = -(1 << 23)
_SAT_HI = (1 << 23) - 1


def _delta_q20(k, a):
    """rshift_round(k * a, 20) exactly, in int32 limb arithmetic.

    Domain: |k| <= 2^20, |a| <= 2^23 (both guaranteed by the clamp/SAT).
    """
    kh = jax.lax.shift_right_arithmetic(k, 11)   # [-2^9, 2^9]
    kl = k & 0x7FF                               # [0, 2^11)
    ah = jax.lax.shift_right_arithmetic(a, 12)   # [-2^11, 2^11)
    al = a & 0xFFF                               # [0, 2^12)
    u = kl * al + jnp.int32(1 << 19)             # [2^19, 2^23 + 2^19)
    t = kh * al + ((kl * ah) << 1) + (u >> 11)   # |.| < 2^24 + 2^13
    return ((kh * ah) << 3) + jax.lax.shift_right_arithmetic(t, 9)


def _lpc_kernel(qt_ref, ord_ref, ct_ref):
    """qt_ref: [P, L] int32 quantized reflection (zeros beyond order are fine,
    rows are masked by order anyway); ord_ref: [1, L] int32;
    ct_ref: [P, L] int32 Q20 direct-form coefficients."""
    L = qt_ref.shape[1]
    order = ord_ref[:, :]
    one = jnp.int32(1 << REF_Q)
    g = []
    for m in range(P):
        qm = qt_ref[m : m + 1, :]
        if m == 0:
            gm = 128 * (qm + 64) * (qm + 64) - one
        elif m == 1:
            gm = one - 128 * (qm + 64) * (qm + 64)
        else:
            gm = qm * 16384
        gm = jnp.clip(gm, -_G_LIM, _G_LIM)  # no-op for valid q; bounds garbage
        g.append(jnp.where(m < order, gm, 0))
    a = [jnp.zeros((1, L), jnp.int32) for _ in range(P)]
    for m in range(1, P + 1):
        k = g[m - 1]
        if m > 1:
            olds = list(a[: m - 1])
            for i in range(m - 1):
                a[i] = jnp.clip(olds[i] - _delta_q20(k, olds[m - 2 - i]),
                                _SAT_LO, _SAT_HI)
        a[m - 1] = jnp.where(m <= order, k, a[m - 1])
    for m in range(P):
        ct_ref[m : m + 1, :] = a[m]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lpc_tiles(qt, ordt, interpret: bool):
    Pq, B = qt.shape
    return pl.pallas_call(
        _lpc_kernel,
        out_shape=jax.ShapeDtypeStruct((P, B), jnp.int32),
        grid=(B // LANES_LPC,),
        in_specs=[
            pl.BlockSpec((P, LANES_LPC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES_LPC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, LANES_LPC), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qt, ordt)


def lpc_from_q_pallas(q: jax.Array, order: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
    """Drop-in for dequantize_reflection + reflection_to_lpc on the fast paths.

    q: [B, P] int32 quantized reflection coefficients; order: [B] int32.
    Returns [B, P] int32 Q20 direct-form coefficients (zeros at slots >=
    order). Bit-identical to the jnp pair for every valid stream.
    """
    if interpret is None:
        interpret = not _backend_is_tpu()
    B = q.shape[0]
    pad = (-B) % LANES_LPC
    qt = jnp.pad(q.astype(jnp.int32), ((0, pad), (0, 0))).T
    ordt = jnp.pad(order.astype(jnp.int32), (0, pad))[None, :]
    ct = _lpc_tiles(qt, ordt, interpret)
    return ct.T[:B]
