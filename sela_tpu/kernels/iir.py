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

import os

from ..format import MAX_ORDER
from ..utils.platform import backend_is_tpu as _backend_is_tpu

LANES = 128
# Fast-kernel tile shape / software pipelining, swept on-chip in
# tools/roofline.py (r5): the inner recurrence is latency-bound, not
# issue-bound, so unrolling U steps with partial-sum corrections overlaps
# U independent multiply/reduce chains. Defaults = sweep winners
# (ROOFLINE.json); env knobs kept for re-sweeps on new hardware.
LANES_FAST = int(os.environ.get("SELA_IIR_LANES", "128"))
UNROLL_FAST = int(os.environ.get("SELA_IIR_UNROLL", "4"))
P = MAX_ORDER


def _make_iir_kernel_generic(unroll: int):
    """Full-int32-range kernel via a 3x2 limb decomposition (r5c).

    Replaces the emulated-64-bit MAC (i64.mul_i32 costs ~12 int32 ops per
    element, carry-chain reductions ~10 more — the old kernel was
    issue-bound on them). Split x = x2*2^22 + x1*2^11 + x0 (x0, x1 in
    [0, 2^11), x2 = x >> 22 in [-2^9, 2^9)) and c = ch*2^12 + cl (cl in
    [0, 2^12), |ch| < 2^11, valid since |c| <= 2^23 by the SAT clamp). The
    six per-tap products and their 32-tap sums are all int32-exact:

      |S_h2| <= 32*2^11*2^9  = 2^25   |S_l2| <= 32*2^12*2^9  = 2^26
      |S_h1| <= 32*2^11*2^11 = 2^27   |S_l1| <= 32*2^12*2^11 = 2^28
      |S_h0| <= 2^27                  |S_l0| <= 2^28

    acc = S_h2*2^34 + S_h1*2^23 + S_l2*2^22 + S_h0*2^12 + S_l1*2^11 + S_l0,
    and the Q20 rounding shift stages exactly — splitting off only terms
    whose scale is a multiple of the remaining divisor (floor distributes
    over exact multiples) and using floor(floor(y/a)/b) = floor(y/(ab)):

      u0 = S_l0 + 2^19                        (>= 0, < 2^29)
      v1 = S_l1 + (u0 >> 11)                  (|v1| < 2^29)
      pred = S_h2 << 14  +  S_h1 << 3  +  S_l2 << 2
             + ((2*S_h0 + v1) >> 9)           (|2*S_h0 + v1| < 2^30)

    In unbounded integers this equals (acc + 2^19) >> 20 exactly; computed
    in int32 the final additions wrap mod 2^32, which is precisely
    i64.to_i32 of the exact value — bit-identical to the old kernel and the
    scan path for EVERY int32 input (the window values are the same wrapped
    int32s every path multiplies). ~12 epilogue ops + 6 plain multiply/
    reduce pairs per step vs the old ~38 + carry chains.

    unroll: same pre-zeroed-history software pipelining as the fast kernel;
    corrections patch the six partial sums with the resolved sample's limb
    products. Requires n_samples % U == 0 (wrapper guarantees).
    """
    U = unroll
    sra = jax.lax.shift_right_arithmetic

    def kernel(et_ref, crev_ref, out_ref, h0, h1, h2):
        n_samples = et_ref.shape[0]
        L = et_ref.shape[1]
        zeros_all = jnp.zeros((P + n_samples, L), jnp.int32)
        h0[:, :] = zeros_all
        h1[:, :] = zeros_all
        h2[:, :] = zeros_all
        crev = crev_ref[:, :]
        ch = sra(crev, 12)
        cl = crev & 0xFFF
        ch_t = [ch[P - d : P - d + 1, :] for d in range(1, U)]
        cl_t = [cl[P - d : P - d + 1, :] for d in range(1, U)]

        def step(i, _):
            n = i * U
            s = []
            for j in range(U):
                w0 = h0[pl.ds(n + j, P), :]
                w1 = h1[pl.ds(n + j, P), :]
                w2 = h2[pl.ds(n + j, P), :]
                s.append([
                    jnp.sum(ch * w2, axis=0, keepdims=True),  # S_h2
                    jnp.sum(ch * w1, axis=0, keepdims=True),  # S_h1
                    jnp.sum(ch * w0, axis=0, keepdims=True),  # S_h0
                    jnp.sum(cl * w2, axis=0, keepdims=True),  # S_l2
                    jnp.sum(cl * w1, axis=0, keepdims=True),  # S_l1
                    jnp.sum(cl * w0, axis=0, keepdims=True),  # S_l0
                ])
            for j in range(U):
                s_h2, s_h1, s_h0, s_l2, s_l1, s_l0 = s[j]
                u0 = s_l0 + jnp.int32(1 << 19)
                v1 = s_l1 + (u0 >> 11)           # u0 >= 0: logical == floor
                pred = ((s_h2 << 14) + (s_h1 << 3) + (s_l2 << 2)
                        + sra(2 * s_h0 + v1, 9))
                x_n = et_ref[pl.ds(n + j, 1), :] + pred
                x0 = x_n & 0x7FF
                x1 = sra(x_n, 11) & 0x7FF
                x2 = sra(x_n, 22)
                h0[pl.ds(n + j + P, 1), :] = x0
                h1[pl.ds(n + j + P, 1), :] = x1
                h2[pl.ds(n + j + P, 1), :] = x2
                out_ref[pl.ds(n + j, 1), :] = x_n
                for d in range(1, U - j):
                    t = s[j + d]
                    t[0] = t[0] + ch_t[d - 1] * x2
                    t[1] = t[1] + ch_t[d - 1] * x1
                    t[2] = t[2] + ch_t[d - 1] * x0
                    t[3] = t[3] + cl_t[d - 1] * x2
                    t[4] = t[4] + cl_t[d - 1] * x1
                    t[5] = t[5] + cl_t[d - 1] * x0
            return 0

        jax.lax.fori_loop(0, n_samples // U, step, 0)

    return kernel


def _make_iir_kernel_fast(unroll: int):
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

    Software pipelining (r5, VERDICT item 1): the serial chain per step
    (tree-reduce -> epilogue -> history write -> next step's products) leaves
    the VPU idle between dependent issues — tools/roofline.py measured the
    1-step body at ~3x the chip's issue-bound time. With `unroll` = U, the
    whole history is pre-zeroed once so the U windows of an iteration can ALL
    be read and tap-summed up front: a not-yet-written slot contributes zero,
    and once x[n+j] resolves, each later step's partial sums are corrected
    with the exact limb products c_d (x) x[n+j] (c_d = crev[P-d]) that the
    zero slot dropped. Correction + partial sum equals the full sum mod 2^32,
    and the full sum is in-bounds by the proof above, so the corrected int32
    bit pattern is IDENTICAL — the epilogue sees the same inputs and the
    result stays bit-exact while U independent multiply/reduce chains
    overlap. Requires n_samples % U == 0 (the wrapper guarantees it).

    Negative result, kept for the record (r5b): a per-tile 8/16/32-tap tier
    dispatch (as kernels/encode.py's FIR now does) was built, proven
    bit-exact, measured on-chip — and removed: all-order-2, all-order-12 and
    all-order-30 batches run at the SAME 3.8-4.0 ms for [8192, 2048]. At
    U = 4 this kernel sits on its serial dependency chain, not on issue
    throughput: per sample the unavoidable chain is x_n -> limb split ->
    correction multiply-add into the next step's partial sums -> the 10-op
    rounding epilogue -> x_{n+1}, ~12 dependent ops; at the chip's measured
    2.6 ns dependent-op latency (ROOFLINE.json vpu.dependent rate) that is
    ~31 ns/sample, and the kernel measures 29 ns/sample — i.e. >=95% of the
    recurrence speed-of-light. Tap-count work is absorbed in the latency
    shadow, so shrinking it buys nothing here (unlike the FIR, which has no
    serial chain and gained 2.6x from the same tiers).
    """
    U = unroll

    def kernel(et_ref, crev_ref, out_ref, hist_l, hist_h):
        n_samples = et_ref.shape[0]
        L = et_ref.shape[1]
        zeros_all = jnp.zeros((P + n_samples, L), jnp.int32)
        hist_l[:, :] = zeros_all   # future slots MUST read as zero (see above)
        hist_h[:, :] = zeros_all
        crev = crev_ref[:, :]
        ch = jax.lax.shift_right_arithmetic(crev, 12)  # [-2^11, 2^11)
        cl = crev & 0xFFF                              # [0, 2^12)
        # correction tap limbs: crev[P - d] is c_d (the coefficient a later
        # step's window applies to a sample resolved d steps earlier)
        ch_t = [ch[P - d : P - d + 1, :] for d in range(1, U)]
        cl_t = [cl[P - d : P - d + 1, :] for d in range(1, U)]

        def step(i, _):
            n = i * U
            # read all U windows BEFORE any write of this iteration
            s = []
            for j in range(U):
                wl = hist_l[pl.ds(n + j, P), :]        # xl of window j
                wh = hist_h[pl.ds(n + j, P), :]        # xh
                s.append([
                    jnp.sum(ch * wh, axis=0, keepdims=True),
                    jnp.sum(ch * wl, axis=0, keepdims=True),
                    jnp.sum(cl * wh, axis=0, keepdims=True),
                    jnp.sum(cl * wl, axis=0, keepdims=True),
                ])
            for j in range(U):
                s_hh, s_hl, s_lh, s_ll = s[j]
                u = s_ll + jnp.int32(1 << 19)
                v = s_lh + (u >> 13)
                c2 = ((v & 0x7F) << 13) | (u & 0x1FFF)
                pred = (s_hh << 5) + jax.lax.shift_right_arithmetic(v, 7) + (
                    jax.lax.shift_right_arithmetic(s_hl + (c2 >> 12), 8)
                )
                x_n = et_ref[pl.ds(n + j, 1), :] + pred
                xl = x_n & 0x1FFF
                xh = jax.lax.shift_right_arithmetic(x_n, 13)
                hist_l[pl.ds(n + j + P, 1), :] = xl
                hist_h[pl.ds(n + j + P, 1), :] = xh
                out_ref[pl.ds(n + j, 1), :] = x_n
                for d in range(1, U - j):
                    t = s[j + d]
                    t[0] = t[0] + ch_t[d - 1] * xh
                    t[1] = t[1] + ch_t[d - 1] * xl
                    t[2] = t[2] + cl_t[d - 1] * xh
                    t[3] = t[3] + cl_t[d - 1] * xl
            return 0

        jax.lax.fori_loop(0, n_samples // U, step, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "lanes", "unroll"))
def _iir_tiles_fast(et: jax.Array, crev: jax.Array, interpret: bool,
                    lanes: int = 0, unroll: int = 0):
    N, Bp = et.shape
    lanes = lanes or LANES_FAST
    unroll = unroll or UNROLL_FAST
    if N % unroll or Bp % lanes:
        lanes, unroll = LANES, 1  # uncommon shapes take the plain body
    grid = (Bp // lanes,)
    return pl.pallas_call(
        _make_iir_kernel_fast(unroll),
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((P + N, lanes), jnp.int32),
            pltpu.VMEM((P + N, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(et, crev)


@functools.partial(jax.jit, static_argnames=("interpret", "unroll"))
def _iir_tiles(et: jax.Array, crev: jax.Array, interpret: bool,
               unroll: int = 0):
    """et: [N, Bp] int32, crev: [P, Bp]; Bp a multiple of LANES."""
    N, Bp = et.shape
    unroll = unroll or UNROLL_FAST
    if N % unroll:
        unroll = 1
    grid = (Bp // LANES,)
    return pl.pallas_call(
        _make_iir_kernel_generic(unroll),
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
            pltpu.VMEM((P + N, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(et, crev)


def iir_synthesize_pallas(e: jax.Array, coeffs: jax.Array,
                          interpret: bool | None = None,
                          fast: bool = True, lanes: int = 0,
                          unroll: int = 0) -> jax.Array:
    """Drop-in replacement for ops.filters.iir_synthesize.

    e: [B, N] int32 residues; coeffs: [B, P] int32 Q20 (zero beyond order).
    fast=True uses the limb-decomposed kernel — exact for any PCM <= 24-bit
    (|x| < 2^26; coeffs are spec-bounded to 2^23). Use fast=False (generic
    64-bit hi/lo kernel) for 32-bit PCM. lanes/unroll override the fast
    kernel's tile width / software-pipeline depth (0 = tuned defaults; used
    by tools/roofline.py sweeps).
    """
    if interpret is None:
        interpret = not _backend_is_tpu()
    B, N = e.shape
    tile = (lanes or LANES_FAST) if fast else LANES
    pad = (-B) % tile
    if pad:
        e = jnp.pad(e, ((0, pad), (0, 0)))
        coeffs = jnp.pad(coeffs, ((0, pad), (0, 0)))
    et = e.T                                   # [N, Bp] time-major
    crev = coeffs[:, ::-1].T                   # [P, Bp]
    if fast:
        xt = _iir_tiles_fast(et, crev, interpret, lanes, unroll)
    else:
        xt = _iir_tiles(et, crev, interpret)
    x = xt.T
    return x[:B] if pad else x
